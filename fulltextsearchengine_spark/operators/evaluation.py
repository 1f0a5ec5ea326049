"""Retrieval-quality evaluation: known-item self-retrieval over the
engine's own index — the regression metric a search deployment watches
across index generations and scorer changes.

Protocol (standard known-item / pseudo-query eval, used because the
corpus carries no human relevance labels): each probe document's top-m
tf-idf terms become a query (the same construction more_like_this
uses, morelikethis.doc_query_terms); the probe document itself is the
known relevant item; the metric is its rank in the BM25 top-k. A
healthy index ranks most probes at 1; drops in MRR between two index
generations localize regressions to scorer/build changes.

Plan shape: ONE postings point-lookup job collects every probe's query
terms (doc_id In-pruned scan — row-group min/max prune, S9 analog),
then ONE bm25_search_batch job scores all queries (broadcast query
frame ⋈ pruned postings scan, per-query rank window). Probe count is
an eval-set size (10s–1000s), never corpus-sized, so both driver
round-trips stay metadata-small at 100 TB."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .search import Searcher


def probe_queries(
    searcher: Searcher, probe_doc_ids: list[int], m: int = 3
) -> dict[int, list[str]]:
    """Each probe doc's top-m terms by tf·ln(N/df), ties by term asc —
    all probes in ONE point-lookup job (doc_query_terms, batched)."""
    n = searcher.stats["num_docs"]
    rows = (
        searcher.index.postings.filter(
            F.col("doc_id").isin([int(d) for d in probe_doc_ids])
        )
        .select("doc_id", "term", "tf")
        .join(searcher.index.terms.select("term", "df"), "term")
        .collect()
    )
    by_doc: dict[int, list[tuple[float, str]]] = {int(d): [] for d in probe_doc_ids}
    for r in rows:
        by_doc[r["doc_id"]].append((-(r["tf"] * math.log(n / r["df"])), r["term"]))
    return {d: [t for _, t in sorted(lst)[:m]] for d, lst in by_doc.items()}


def retrieval_eval(
    searcher: Searcher, probe_doc_ids: list[int], m: int = 3, k: int = 10
) -> DataFrame:
    """(probe_doc_id, rank_at_k, rr_micro): the probe's rank in its own
    query's BM25 top-k (0 = missed the cutoff), and reciprocal rank
    ×1e6. MRR@k = avg(rr_micro)/1e6; hit-rate@k = avg(rank_at_k > 0)."""
    spark = searcher.index.postings.sparkSession
    queries = probe_queries(searcher, probe_doc_ids, m=m)
    res = searcher.bm25_search_batch({str(d): q for d, q in queries.items() if q}, k)
    hits = {
        int(r["query_id"]): r["rank"]
        for r in res.filter(
            F.col("doc_id") == F.col("query_id").cast("long")
        ).collect()
    }
    out = [
        (
            int(d),
            int(hits.get(int(d), 0)),
            int(round(1e6 / hits[int(d)])) if int(d) in hits else 0,
        )
        for d in probe_doc_ids
    ]
    return spark.createDataFrame(
        out, "probe_doc_id long, rank_at_k long, rr_micro long"
    )


# --- graded relevance metrics (NDCG / MRR / P@k / recall@k) ----------------
#
# The reference has no evaluation surface at all; a search deployment
# cannot ship ranking changes without one. With no human labels in the
# corpus, qrels are SYNTHESIZED deterministically from the corpus
# itself (standard pseudo-qrels protocol): grade(q, d) = number of
# distinct query terms present in d, capped at 3 — docs matching more
# of the query are "more relevant", graded 1..3. The metric values are
# then exactly reproducible across engines (the DuckDB gate recomputes
# them from scratch), which is what an eval harness needs: a number
# that moves ONLY when ranking moves.
#
# Plan shape at 100 TB: qrels = one broadcast(query terms) ⋈ pruned
# postings scan + (query, doc) partial agg — query-set-sized output.
# Metrics join the k·|queries|-row result frame against qrels and
# aggregate per query: every post-retrieval frame is eval-set-sized,
# never corpus-sized.


def qrels_from_corpus(
    searcher: Searcher, queries: dict[str, list[str]]
) -> DataFrame:
    """(query_id, doc_id, grade): pseudo-qrels — grade = distinct query
    terms present in the doc, capped at 3. Only grade>0 rows exist."""
    from .search import normalize_query

    spark = searcher.index.postings.sparkSession
    rows = sorted(
        {(qid, t) for qid, ts in queries.items() for t in normalize_query(ts)}
    )
    if not rows:
        return spark.createDataFrame([], "query_id string, doc_id long, grade int")
    qdf = spark.createDataFrame(rows, "query_id string, term string")
    p = searcher.index.postings.filter(
        F.col("term").isin(sorted({t for _, t in rows}))
    )
    return (
        p.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.least(F.countDistinct("term"), F.lit(3)).cast("int").alias("grade"))
    )


def graded_eval(
    searcher: Searcher,
    queries: dict[str, list[str]],
    k: int = 10,
    qrels: DataFrame | None = None,
) -> DataFrame:
    """(query_id, ndcg_micro, rr_micro, precision_micro, recall_micro):
    graded ranking metrics of the BM25 top-k per query, ×1e6 as ints.

    ndcg: DCG@k / IDCG@k with gain 2^grade − 1, discount log2(rank+1);
    rr: 1/first relevant rank; precision: relevant-retrieved / k;
    recall: relevant-retrieved / total-relevant. Queries with no
    relevant docs (or no results) report zeros rather than vanishing.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    spark = searcher.index.postings.sparkSession
    if qrels is None:
        qrels = qrels_from_corpus(searcher, queries)
    res = searcher.bm25_search_batch(queries, k)

    j = res.select("query_id", "doc_id", "rank").join(
        qrels, ["query_id", "doc_id"], "left"
    ).select(
        "query_id", "rank", F.coalesce(F.col("grade"), F.lit(0)).alias("grade")
    )
    gain = F.pow(F.lit(2.0), F.col("grade")) - 1.0
    per_q = j.groupBy("query_id").agg(
        F.sum(gain / F.log2(F.col("rank") + 1.0)).alias("dcg"),
        F.min(F.when(F.col("grade") > 0, F.col("rank"))).alias("first_rel"),
        F.sum((F.col("grade") > 0).cast("long")).alias("hits"),
    )

    iw = Window.partitionBy("query_id").orderBy(F.desc("grade"), F.asc("doc_id"))
    ideal = (
        qrels.withColumn("irn", F.row_number().over(iw))
        .filter(F.col("irn") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                / F.log2(F.col("irn") + 1.0)
            ).alias("idcg")
        )
    )
    rel_tot = qrels.groupBy("query_id").agg(F.count("*").alias("n_rel"))

    qids = spark.createDataFrame(
        [(q,) for q in sorted(queries)], "query_id string"
    )
    out = (
        qids.join(per_q, "query_id", "left")
        .join(ideal, "query_id", "left")
        .join(rel_tot, "query_id", "left")
    )
    micro = lambda c: F.round(c * 1e6).cast("long")  # noqa: E731
    zero = F.lit(0).cast("long")
    return out.select(
        "query_id",
        F.coalesce(
            F.when(F.col("idcg") > 0, micro(F.col("dcg") / F.col("idcg"))), zero
        ).alias("ndcg_micro"),
        F.coalesce(
            F.when(F.col("first_rel").isNotNull(), micro(1.0 / F.col("first_rel"))),
            zero,
        ).alias("rr_micro"),
        F.coalesce(micro(F.col("hits") / F.lit(float(k))), zero).alias(
            "precision_micro"
        ),
        F.coalesce(
            F.when(F.col("n_rel") > 0, micro(F.col("hits") / F.col("n_rel"))), zero
        ).alias("recall_micro"),
    )
