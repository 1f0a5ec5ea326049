"""Streaming deduplication — stateful exact + near-dup over micro-batches.

The reference has no streaming surface (SURVEY.md §2.9); these are the
training-data-pipeline analogs for continuous ingest:

- ``streaming_exact_dedup``: keep the FIRST occurrence of each
  canonical-text hash across all micro-batches.
  ``dropDuplicates(["text_hash"])`` on an unbounded stream stores one
  state row per distinct hash — exactly the semantics of batch
  ``exact_dedup`` (operators/dedup.py) extended over time. With a
  watermark + ``dropDuplicatesWithinWatermark`` the state is bounded
  for 100-TB/day ingest (dupes are overwhelmingly near-in-time:
  retries, crawler revisits, re-sent batches).

- ``streaming_simhash_dedup``: custom stateful operator via
  ``applyInPandasWithState`` — per SimHash-prefix group, keeps the
  set of seen 64-bit signatures and drops new turns whose signature
  is within ``max_hamming`` of a seen one. The prefix (top ``p`` bits)
  is the state key, so state shards across executors and a candidate
  only compares against its own bucket.

The signature itself is computed by an Arrow pandas UDF bit-identical
to the Catalyst ``dedup.simhash64`` (asserted in
tests/test_stream_dedup.py): streaming queries allow only one stateful
operator in append mode, so the batch version's explode+groupBy
aggregation is re-expressed as a stateless per-row UDF.

At 100 TB scale: exact-dedup state is a hash set sharded by key
(Spark's state store); simhash state shards by prefix and ages out via
GroupStateTimeout if configured.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import canonical_text_hash

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
_U64 = 1 << 64
_I64_MAX = (1 << 63) - 1


def simhash64_py(text: str | None) -> int:
    """Pure-Python twin of operators/dedup.simhash64 (md5-half bit
    votes; see dedup.py:185-213). Bit-identical by construction; locked
    by test_stream_dedup.test_pandas_simhash_matches_catalyst."""
    tf = Counter(t.lower() for t in _TOKEN_RE.findall(text or ""))
    votes = [0] * 64
    for term, n in tf.items():
        mh = hashlib.md5(term.encode("utf-8")).hexdigest()
        h1 = int(mh[:8], 16)
        h2 = int(mh[8:16], 16)
        for i in range(32):
            votes[i] += n if (h1 >> i) & 1 else -n
            votes[32 + i] += n if (h2 >> i) & 1 else -n
    sig = 0
    for i in range(64):
        if votes[i] > 0:
            sig |= 1 << i
    return sig - _U64 if sig > _I64_MAX else sig  # int64 two's complement


@F.pandas_udf(T.LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    return texts.map(simhash64_py).astype("int64")


def streaming_exact_dedup(
    stream: DataFrame,
    within_watermark: str | None = None,
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """First-wins exact dedup on a streaming DataFrame.

    ``within_watermark`` (e.g. ``"10 minutes"``) bounds state: duplicates
    arriving later than the watermark delay are passed through (the
    at-scale trade; omit for exact unbounded state)."""
    hashed = stream.withColumn("text_hash", canonical_text_hash(F.col(text_col)))
    if within_watermark is not None:
        return hashed.withWatermark(ts_col, within_watermark).dropDuplicatesWithinWatermark(
            ["text_hash"]
        )
    return hashed.dropDuplicates(["text_hash"])


def _popcount64(arr):
    import numpy as np

    return np.unpackbits(arr.astype(np.uint64).view(np.uint8)).reshape(len(arr), 64).sum(axis=1)


def _simhash_state_fn(max_hamming: int, out_cols: list[str], max_state: int | None):
    import numpy as np

    def fn(key, pdf_iter, state):
        # prior-batch signatures stay in ONE immutable numpy array
        # (vectorized scan); within-batch accepts accumulate in a Python
        # list and concatenate ONCE at the end — np.append per row was
        # O(n²) reallocation over the group's lifetime (r2 ADVICE)
        seen = np.array(state.get[0] if state.exists else [], dtype=np.int64)
        new: list[int] = []
        out = []
        for pdf in pdf_iter:
            sigs = pdf["simhash"].to_numpy("int64")
            keep = np.ones(len(pdf), dtype=bool)
            for i, s in enumerate(sigs.tolist()):
                if seen.size:
                    d = _popcount64(seen ^ np.int64(s))
                    if (d <= max_hamming).any():
                        keep[i] = False
                        continue
                if any(((s ^ t) & (_U64 - 1)).bit_count() <= max_hamming for t in new):
                    keep[i] = False
                    continue
                new.append(s)
            if keep.any():
                out.append(pdf.loc[keep, out_cols])
        merged = seen.tolist() + new
        if max_state is not None and len(merged) > max_state:
            merged = merged[-max_state:]  # FIFO: oldest signatures age out
        state.update((merged,))
        if out:
            yield pd.concat(out)

    return fn


def streaming_simhash_dedup(
    stream: DataFrame,
    max_hamming: int = 3,
    prefix_bits: int = 8,
    text_col: str = "text",
    timeout: str = "NoTimeout",
    max_state_per_group: int | None = None,
) -> DataFrame:
    """Near-dup suppression on a stream: drop a turn whose SimHash is
    within ``max_hamming`` of any previously-seen turn sharing the top
    ``prefix_bits`` signature bits.

    Blocking caveat (inherent to any prefix scheme): a near-dup pair
    differing inside the prefix lands in different state groups and is
    missed — bounded recall loss, acceptable for corpus thinning;
    exactness needs the batch pigeonhole (dedup.simhash_near_pairs).

    ``max_state_per_group`` caps each prefix group's seen-set (oldest
    signatures age out FIFO) so hot groups stay O(cap) per candidate on
    long-running streams; None keeps exact unbounded state.
    """
    sh = stream.withColumn("simhash", _simhash_udf(F.col(text_col))).withColumn(
        "sh_prefix", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    )
    out_cols = [c for c in sh.columns if c != "sh_prefix"]
    out_schema = T.StructType([sh.schema[c] for c in out_cols])
    state_schema = T.StructType([T.StructField("seen", T.ArrayType(T.LongType()))])
    return sh.groupBy("sh_prefix").applyInPandasWithState(
        _simhash_state_fn(max_hamming, out_cols, max_state_per_group),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


__all__ = ["streaming_exact_dedup", "streaming_simhash_dedup", "simhash64_py"]
