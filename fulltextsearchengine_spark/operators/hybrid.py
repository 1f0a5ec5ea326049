"""Hybrid sparse+dense retrieval via Reciprocal Rank Fusion (Cormack,
Clarke & Büttcher, SIGIR 2009 — the public fusion every hybrid-search
stack uses): fuse a BM25 ranking with an embedding-cosine ranking
without score calibration.

    rrf(d) = Σ_lists 1 / (rrf_k + rank_list(d))      (absent → no term)

Rank is ordinal (1-based, dense ranking over the list's own total
order), so the fusion is exact integer arithmetic over two top-``pool``
lists — no float-calibration drift between the BM25 and cosine score
scales, which is precisely why RRF beats score interpolation in
practice and why an ANSI-SQL oracle can reproduce it digit-for-digit.

Scale shape: each arm is the engine's existing top-``pool`` operator
(pruned BM25 / one-scan cosine); the fusion itself touches 2·pool rows
— a driver-sized full-outer join Spark broadcasts. The expensive work
stays in the arms, which already have their own 100-TB stories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K = 60


def with_rank(scores: DataFrame, score_col: str, id_col: str) -> DataFrame:
    """(id, rank): 1-based by score desc, id asc — the same total order
    every top-k in the engine uses. The input is a top-``pool`` list
    (already bounded), so the single-partition window is rank-exact and
    cheap by construction."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return scores.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    ranked_lists: list[DataFrame], k: int = 10, rrf_k: int = RRF_K
) -> DataFrame:
    """(id, rrf_score) top-k from ≥1 (id, rank) frames; ties by id asc."""
    if not ranked_lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    fused = None
    for i, rl in enumerate(ranked_lists):
        part = rl.select("id", (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias(f"c_{i}"))
        fused = part if fused is None else fused.join(part, "id", "full_outer")
    contrib = [F.coalesce(F.col(f"c_{i}"), F.lit(0.0)) for i in range(len(ranked_lists))]
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    return (
        fused.select("id", total.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc("id"))
        .limit(k)
    )


def hybrid_search(
    bm25_scores: DataFrame,
    cosine_scores: DataFrame,
    k: int = 10,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Fuse a (doc-keyed) BM25 top-pool and a cosine top-pool that share
    an id space: bm25_scores has (id, score), cosine_scores (id, cosine).
    Returns (id, rrf_score) top-k."""
    return rrf_fuse(
        [
            with_rank(bm25_scores, "score", "id"),
            with_rank(cosine_scores, "cosine", "id"),
        ],
        k=k,
        rrf_k=rrf_k,
    )


def minmax_normalize(scores: DataFrame, score_col: str, id_col: str) -> DataFrame:
    """(id, nscore): scores rescaled to [0, 1] by the list's own min/max
    (the standard interpolation-fusion calibration, e.g. ES 8 hybrid
    "min_max" normalizer). A degenerate list (max == min) maps to 1.0 —
    every member is equally "best in list". The input is a top-``pool``
    list, so the min/max agg is one row and attaches via a broadcast
    cross join, never a window."""
    stats = scores.agg(
        F.min(score_col).alias("_lo"), F.max(score_col).alias("_hi")
    )
    return scores.crossJoin(F.broadcast(stats)).select(
        F.col(id_col).alias("id"),
        F.when(F.col("_hi") == F.col("_lo"), F.lit(1.0))
        .otherwise((F.col(score_col) - F.col("_lo")) / (F.col("_hi") - F.col("_lo")))
        .alias("nscore"),
    )


def hybrid_weighted_search(
    sparse_scores: DataFrame,
    dense_scores: DataFrame,
    k: int = 10,
    w_sparse: float = 0.5,
    w_dense: float = 0.5,
    id_col: str = "id",
) -> DataFrame:
    """(id, fused_score): min-max-normalized weighted interpolation of
    two top-pool lists — the OTHER standard hybrid fusion (convex score
    combination), complementing RRF: interpolation preserves score
    MAGNITUDE information RRF's ordinal ranks discard, at the price of
    the min-max calibration this function applies.

    Inputs are (id_col, score) frames (each already a bounded top-pool
    list). A doc absent from one list contributes 0 from that arm (its
    true normalized score is unknowable without unbounding the pool —
    the same convention ES hybrid search uses). Ties break id asc."""
    sn = minmax_normalize(sparse_scores, "score", id_col)
    dn = minmax_normalize(dense_scores, "score", id_col)
    fused = (
        sn.withColumnRenamed("nscore", "ns")
        .join(dn.withColumnRenamed("nscore", "nd"), "id", "full_outer")
        .select(
            "id",
            (
                F.lit(w_sparse) * F.coalesce(F.col("ns"), F.lit(0.0))
                + F.lit(w_dense) * F.coalesce(F.col("nd"), F.lit(0.0))
            ).alias("fused_score"),
        )
    )
    return fused.orderBy(F.desc("fused_score"), F.asc("id")).limit(k)
