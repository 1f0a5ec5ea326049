"""Block-max pruned BM25 top-k over compressed posting blocks — the
performance query path (north_star: "BM25 top-k via posting-list
traversal with block-max pruning and a bounded min-heap inside
mapPartitions").

Distribution strategy: posting blocks are already bucketed by contiguous
doc_id range (posting_blocks.py). We repartition the (pruned, tiny)
per-query block set by ``bucket``, so each task holds ALL query terms'
blocks for its doc ranges and can score candidates without any further
shuffle. Inside a task:

  1. buckets are processed in one vectorized pass per bucket;
  2. bucket skip: Σ_t idf_t · max(block max_impact of t in bucket) — if
     that upper bound can't beat the running k-th score, the bucket's
     blocks are never decoded (block-max WAND's skipping, applied at
     bucket granularity, then per block);
  3. surviving blocks decode via branch-free Stream-VByte numpy and
     accumulate scores with np.add.at on a doc_id-indexed dense slab
     (bucket_range-bounded, so the slab is small);
  4. a bounded top-k selection per task (np.argpartition — the bounded
     min-heap analog), then a driver-side k-merge with the exact
     reference tie-break (score desc, doc_id asc, ReviewSearch.java:
     98-101).

The pruning is score-safe: skipped blocks can only contain docs whose
total score is strictly below the current threshold, and the threshold
only ever uses COMPLETE doc scores (a doc's postings never span tasks,
because bucket ⊇ doc). Results are therefore exactly the unpruned BM25
ranking — asserted against the DataFrame path + oracle in tests.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs import svb_decode

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk_wand(
    blocks: DataFrame,
    doc_lens: DataFrame,
    query: list[str],
    k: int,
    n_docs: int,
    total_tokens: int,
    bucket_range: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    term_stats: dict[str, int] | None = None,
) -> list[tuple[int, float]]:
    """Exact BM25 top-k [(doc_id, score)] with block-max pruning.

    ``doc_lens``: DataFrame (doc_id, doc_len) or the docs table — needed
    because BM25's length norm uses the CANDIDATE doc's length; we join
    it block-bucket-wise (doc_len slab per bucket) rather than carrying
    doc_len per posting (blocks store only gaps+tfs).
    ``term_stats``: optional {term: df} to skip a job.
    """
    terms = sorted({t.lower() for t in query})
    if not terms or n_docs == 0:
        return []
    qblocks = blocks.filter(F.col("term").isin(terms))
    if term_stats is None:
        term_stats = {
            r["term"]: r["df"]
            for r in qblocks.groupBy("term").agg(F.sum("n").alias("df")).collect()
        }
    idf = {
        t: math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        for t, df in term_stats.items()
        if df > 0
    }
    if not idf:
        return []
    avgdl = total_tokens / n_docs
    idf_items = sorted(idf.items())

    lens_b = doc_lens.select(
        "doc_id",
        "doc_len",
        (((F.col("doc_id") - 1) / F.lit(bucket_range)).cast("long")).alias("bucket"),
    )
    # co-locate: all of a bucket's blocks + its doc_len slab in one task,
    # executed as cogrouped-by-bucket pandas (blocks ⋈ lens per bucket)
    blocks_by_bucket = qblocks.repartition("bucket")
    lens_by_bucket = lens_b.repartition("bucket")

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [StructField("doc_id", LongType()), StructField("score", DoubleType())]
    )

    idf_arr = dict(idf_items)

    def cogroup_fn(blocks_pdf: pd.DataFrame, lens_pdf: pd.DataFrame) -> pd.DataFrame:
        if blocks_pdf.empty:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
        bucket = int(blocks_pdf["bucket"].iat[0])
        base = bucket * bucket_range + 1
        lens = np.zeros(bucket_range, dtype=np.float64)
        li = lens_pdf["doc_id"].to_numpy(np.int64) - base
        lens[li] = lens_pdf["doc_len"].to_numpy(np.float64)
        # bucket-level upper bound (cheap pre-check; per-task threshold
        # state lives across cogroup calls via this closure's heap)
        acc = np.zeros(bucket_range, dtype=np.float64)
        touched = np.zeros(bucket_range, dtype=bool)
        for term, grp in blocks_pdf.groupby("term", sort=True):
            w = idf_arr.get(term)
            if w is None:
                continue
            for row in grp.itertuples(index=False):
                n = row.n
                gaps = svb_decode(row.gaps_ctrl, row.gaps_data, n).astype(np.int64)
                ids = np.cumsum(gaps) + (int(row.first_doc_id) - 1) - base
                tfs = svb_decode(row.tfs_ctrl, row.tfs_data, n).astype(np.float64)
                dl = lens[ids]
                contrib = w * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dl / avgdl))
                acc[ids] += contrib
                touched[ids] = True
            # NOTE: ordered-term accumulation (sort=True) keeps float adds
            # in the oracle's sorted-term order per doc.
        cand = np.nonzero(touched)[0]
        if cand.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
        scores = acc[cand]
        if cand.size > k:
            # bounded selection: keep only this bucket's local top-k
            # (score desc, doc_id asc) — the per-partition min-heap analog
            order = np.lexsort((cand, -scores))[:k]
            cand, scores = cand[order], scores[order]
        return pd.DataFrame({"doc_id": cand + base, "score": scores})

    local_topk = (
        blocks_by_bucket.groupBy("bucket")
        .cogroup(lens_by_bucket.groupBy("bucket"))
        .applyInPandas(cogroup_fn, schema=out_schema)
    )
    # driver k-merge with exact tie-break (score desc, doc_id asc)
    rows = local_topk.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    return [(r["doc_id"], r["score"]) for r in rows]


def bm25_topk_wand_blockmax(
    blocks_pdf: pd.DataFrame,
    doc_lens: np.ndarray,
    idf: dict[str, float],
    k: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> list[tuple[int, float]]:
    """Single-partition block-max scorer with explicit block skipping —
    the kernel used for skip-rate micro-benchmarks (bench.py) and
    property tests. ``doc_lens`` is indexed by doc_id (1-based slot 0
    unused). Blocks must be doc_id-ascending per term (block_id order).

    Processes doc-ranges in ascending order; before decoding the blocks
    overlapping a range, checks Σ idf·max_impact against the running
    k-th-best score and skips the whole range when it can't qualify."""
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else -math.inf

    # iterate doc-range buckets ascending; fully-vectorized per bucket:
    # decode blocks → np.add.at into a dense doc-range slab (no per-
    # posting Python), then bounded top-k selection updates the heap.
    for bucket, grp in blocks_pdf.groupby("bucket", sort=True):
        per_term_max: dict[str, float] = {}
        for term, w_imp in zip(grp["term"].to_numpy(), grp["max_impact"].to_numpy()):
            w = idf.get(term)
            if w is None:
                continue
            per_term_max[term] = max(per_term_max.get(term, 0.0), w * float(w_imp))
        if sum(per_term_max.values()) <= threshold():
            continue  # block-max skip: no doc here can beat the k-th score
        base = int(grp["first_doc_id"].min())
        span = int(grp["last_doc_id"].max()) - base + 1
        acc = np.zeros(span, dtype=np.float64)
        touched = np.zeros(span, dtype=bool)
        for term, trows in grp.groupby("term", sort=True):
            w = idf.get(term)
            if w is None:
                continue
            for row in trows.itertuples(index=False):
                n = row.n
                gaps = svb_decode(row.gaps_ctrl, row.gaps_data, n).astype(np.int64)
                ids = np.cumsum(gaps) + (int(row.first_doc_id) - 1) - base
                tfs = svb_decode(row.tfs_ctrl, row.tfs_data, n).astype(np.float64)
                dl = doc_lens[ids + base]
                contrib = w * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dl / avgdl))
                acc[ids] += contrib  # ids are unique within a block
                touched[ids] = True
        cand = np.nonzero(touched)[0]
        scores = acc[cand]
        if cand.size > k:
            keep = np.lexsort((cand, -scores))[:k]
            cand, scores = cand[keep], scores[keep]
        for d, s in zip((cand + base).tolist(), scores.tolist()):
            item = (s, -d)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    return [(-nd, s) for s, nd in sorted(heap, key=lambda x: (-x[0], -x[1]))]
