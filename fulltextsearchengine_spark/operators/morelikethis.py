"""More-like-this: query-by-document retrieval (Lucene's MoreLikeThis
pattern, public API surface) — find turns similar to a given turn.

Composition of two operators the engine already has: the source turn's
top-m tf-idf terms become the query (the same integer index quantities
keyword extraction uses, keywords.py), fed to the standard BM25 scorer.
Nothing new touches the index tables.

Plan shape: term selection is a doc_id point-lookup on postings (one
parquet row-group via min/max — the S9 random-access analog) joined to
the terms rows of that doc's ≤doc_len terms; m is tiny, so the chosen
terms collect to the driver and the main query runs exactly like any
BM25 search (pruned In-scan + one shuffle + TakeOrderedAndProject).
The self-hit is dropped after scoring (fetch k+1, filter, keep k).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import Searcher


def doc_query_terms(searcher: Searcher, doc_id: int, m: int = 5) -> list[str]:
    """The doc's top-m terms by tf·ln(N/df), ties by term asc — the
    query MoreLikeThis will run."""
    n = searcher.stats["num_docs"]
    rows = (
        searcher.index.postings.filter(F.col("doc_id") == int(doc_id))
        .select("term", "tf")
        .join(searcher.index.terms.select("term", "df"), "term")
        .collect()
    )
    scored = sorted(
        ((-(r["tf"] * math.log(n / r["df"])), r["term"]) for r in rows)
    )
    return [t for _, t in scored[:m]]


def more_like_this(
    searcher: Searcher, doc_id: int, m: int = 5, k: int = 10
) -> DataFrame:
    """(doc_id, score): BM25 top-k for the source doc's top-m tf-idf
    terms, source doc excluded."""
    query = doc_query_terms(searcher, doc_id, m)
    if not query:
        return searcher._empty_scores()
    hits = searcher.bm25_search(query, k + 1)
    return (
        hits.filter(F.col("doc_id") != int(doc_id))
        .orderBy(F.desc("score"), F.asc("doc_id"))  # ≤ k+1 rows — re-sort is free
        .limit(k)
    )
