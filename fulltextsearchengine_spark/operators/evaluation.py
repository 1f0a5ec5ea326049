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

from pyspark.sql import DataFrame
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
