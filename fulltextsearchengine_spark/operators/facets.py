"""Faceted search: per-facet hit counts + per-facet top-k over the
BM25 candidate set.

The reference exposes flat ranked lists only (ReviewSearch.java's
vectorSpaceQuery/languageModelQuery return an Enumeration of docIds);
every production search UI additionally groups the SAME candidate set
by a metadata field (role, tool, source …) and shows "N hits" plus the
best few per group. This operator derives both from one scored frame —
no second scoring pass.

Scale shape (100 TB): candidates are term-pruned (the scorer's pushed
``In(term, …)`` scan), so the windowed frame is query-sized, not
corpus-sized. The per-facet top-k is ``row_number() OVER (PARTITION BY
facet ORDER BY score DESC, doc_id)`` with a ``rank <= k`` filter —
Catalyst rewrites that to WindowGroupLimit (Spark ≥3.5), which keeps a
bounded per-group heap on the MAP side before the facet shuffle, so a
skewed facet (one role holding 90% of hits) never materializes its
full sorted group. Facet counts come from a separate partial-agg
groupBy and re-attach via a broadcast join (facet cardinality is tiny
by construction — it's a UI grouping key)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .search import Searcher


def faceted_search(
    searcher: Searcher,
    query: list[str] | None = None,
    facet_col: str = "role",
    per_facet_k: int = 5,
    scores: DataFrame | None = None,
) -> DataFrame:
    """(facet, facet_hits, facet_rank, doc_id, score_micro): BM25
    candidates grouped by ``facet_col`` with per-facet hit counts and
    the per-facet top ``per_facet_k`` by (score desc, doc_id asc).

    ``scores``: optional pre-scored (doc_id, score) frame — facets then
    group THAT candidate set, so any scorer composes (bm25_scores_msm,
    boolquery pivots, filtered/conjunctive variants) without a second
    scoring pass. Exactly one of ``query``/``scores`` must be given.

    NULL facet values group under their own NULL row (kept — absence
    is a real bucket in a UI)."""
    if (query is None) == (scores is None):
        raise ValueError("pass exactly one of query= or scores=")
    scored = scores if scores is not None else searcher.bm25_scores(query)
    docs = searcher.index.docs.select("doc_id", F.col(facet_col).alias("facet"))
    cand = scored.join(docs, "doc_id")

    counts = cand.groupBy("facet").agg(F.count(F.lit(1)).alias("facet_hits"))

    w = Window.partitionBy("facet").orderBy(F.desc("score"), F.asc("doc_id"))
    topk = (
        cand.withColumn("facet_rank", F.row_number().over(w))
        .filter(F.col("facet_rank") <= per_facet_k)
    )
    counts = counts.withColumnRenamed("facet", "facet_c")
    return (
        # eqNullSafe: a NULL facet is a real bucket and must keep its count
        topk.join(
            F.broadcast(counts),
            topk["facet"].eqNullSafe(counts["facet_c"]),
            "left",
        )
        .select(
            "facet",
            "facet_hits",
            "facet_rank",
            "doc_id",
            F.round(F.col("score") * 1e6).cast("long").alias("score_micro"),
        )
    )


def hits_time_histogram(
    searcher: Searcher,
    query: list[str] | None = None,
    granularity: str = "hour",
    scores: DataFrame | None = None,
) -> DataFrame:
    """(bucket_ts, n_hits, sum_score, max_score): the ES
    ``date_histogram`` aggregation over a query's candidate set —
    "when did the matching turns happen", the standard dashboard view
    over transcript search.

    Same composition contract as ``faceted_search``: pass ``query`` for
    plain BM25 candidates or ``scores`` (any (doc_id, score) frame) to
    histogram an msm/boolean/filtered candidate set. The scored frame is
    query-sized (term-pruned scan), the join brings ts from docs on the
    doc_id key, and the bucket agg is a partial-agg groupBy over at most
    |hits| rows → one small exchange. ``granularity`` is any
    ``date_trunc`` unit (hour/day/week/month).

    Scores sum in a deterministic micro-rounded domain: per-bucket sums
    add micro-ints, so cross-engine float association can't wobble the
    totals.
    """
    if (query is None) == (scores is None):
        raise ValueError("pass exactly one of query= or scores=")
    if granularity not in ("minute", "hour", "day", "week", "month", "year"):
        raise ValueError(f"unsupported granularity {granularity!r}")
    scored = scores if scores is not None else searcher.bm25_scores(query)
    docs = searcher.index.docs.select("doc_id", "ts")
    cand = scored.join(docs, "doc_id").select(
        F.date_trunc(granularity, F.col("ts")).alias("bucket_ts"),
        F.round(F.col("score") * 1e6).cast("long").alias("score_micro"),
    )
    return cand.groupBy("bucket_ts").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.sum("score_micro").alias("sum_score_micro"),
        F.max("score_micro").alias("max_score_micro"),
    )
