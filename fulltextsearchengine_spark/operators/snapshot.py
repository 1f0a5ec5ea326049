"""Incremental corpus dedup against a prior snapshot.

A continuously-crawled training corpus is built in waves; each new wave
must drop documents already present in (or near-duplicating) what was
previously kept — WITHOUT re-deduplicating the old corpus. The prior
snapshot is represented by its fingerprints only, never its text.

Two levels:

- ``dedup_against_snapshot`` — exact: anti-join the new wave's token
  fingerprint (functions/textstats.with_fingerprint — md5 of the
  normalized token stream, so whitespace/case variants collapse)
  against the snapshot fingerprint set. One shuffle on a 32-byte key;
  when the snapshot fingerprint table is driver-sized, Spark/AQE
  broadcasts it and the 100-TB side never shuffles at all.
- ``simhash_against_snapshot`` — near-dup: band-join the new wave's
  SimHash against the snapshot's (same pigeonhole banding as
  operators/dedup.simhash_near_pairs, lossless for the given
  ``max_hamming``), drop waves rows within hamming distance. Cost is
  proportional to band-bucket collisions, not |new|×|old|.

The reference engine is single-corpus batch (SURVEY §2); incremental
ingest parity lives in streaming/stream_index.py — this is the
corpus-level analog for the training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import with_fingerprint
from .dedup import simhash64, simhash_band_cols


def snapshot_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The durable representation of a kept corpus: one ``fingerprint``
    column (md5 of the normalized token stream). Persist this table per
    wave; it is what future waves dedup against."""
    return with_fingerprint(docs, text_col).select("fingerprint").distinct()


def dedup_against_snapshot(
    new_docs: DataFrame,
    snapshot: DataFrame,
    text_col: str = "text",
    broadcast_snapshot: bool = False,
) -> DataFrame:
    """Rows of ``new_docs`` whose normalized-token fingerprint does NOT
    appear in ``snapshot`` (a ``snapshot_fingerprints`` output, or any
    frame with a ``fingerprint`` column). Schema passes through.

    ``broadcast_snapshot=True`` pins the broadcast when the caller knows
    the snapshot fingerprint set fits the driver (AQE usually decides
    this on its own from runtime stats)."""
    snap = snapshot.select("fingerprint").distinct()
    if broadcast_snapshot:
        snap = F.broadcast(snap)
    fp = with_fingerprint(new_docs, text_col)
    return fp.join(snap, "fingerprint", "left_anti").drop("fingerprint")


def simhash_against_snapshot(
    new_docs: DataFrame,
    snapshot_docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``new_docs`` with no snapshot document within
    ``max_hamming`` SimHash bits. Banding is lossless for the given
    radius (``max_hamming + 1`` bands — pigeonhole, same scheme
    operators/dedup.simhash_near_pairs pins against brute force).

    ``snapshot_docs`` needs (id, text) — or pre-computed signatures via
    a ``simhash`` column, in which case text is not read."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    n_bands = max_hamming + 1

    def banded(df: DataFrame, side: str) -> DataFrame:
        if "simhash" in df.columns:
            sig = df.select(F.col(id_col).alias("doc_id"), "simhash")
        else:
            sig = simhash64(df, id_col=id_col, text_col=text_col)
        return sig.select(
            F.col("doc_id").alias(f"{side}_id"),
            F.col("simhash").alias(f"{side}_sig"),
            F.explode(simhash_band_cols(F.col("simhash"), n_bands)).alias("bb"),
        ).select(
            f"{side}_id",
            f"{side}_sig",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )

    hits = (
        banded(new_docs, "new")
        .join(banded(snapshot_docs, "old"), ["band", "bucket"])
        .where(
            F.bit_count(F.col("new_sig").bitwiseXOR(F.col("old_sig"))) <= max_hamming
        )
        .select("new_id")
        .distinct()
    )
    return new_docs.join(hits, new_docs[id_col] == hits["new_id"], "left_anti")
