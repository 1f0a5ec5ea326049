"""Score explanation — the Lucene ``Explanation``/Elasticsearch
``_explain`` analog: per-(doc, term) BM25 breakdown for a query's top-k
results, for relevance debugging and ranking-change review.

The reference engine returns opaque scores (ReviewSearch.java:65-104);
when a ranking change ships (new scorer, synonym map, recency decay),
the first question is "why did THIS doc move" — answered by the
term-level decomposition, not the total.

Plan shape: the top-k frame is k rows — Spark broadcasts it into the
pruned postings scan (one BroadcastHashJoin, no extra shuffle beyond
the scorer's own); df/idf are driver-side literals folded into a
when-chain (query terms are few), so the explanation costs one
candidate-restricted scan on top of the search itself.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import BM25_B, BM25_K1, Searcher, normalize_query


def explain_bm25(
    searcher: Searcher,
    query: list[str],
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """One row per (doc_id, term) with term present in a top-k doc:
    (doc_id, term, tf, doc_len, df, idf, contrib, score) where
    contrib = idf·tf·(k1+1)/(tf + k1·(1−b+b·doc_len/avgdl)) and score
    is the doc's total (the sum of its contribs — absent query terms
    contribute exactly 0 in BM25, so rows are emitted only for matches).
    """
    terms = sorted(set(normalize_query(query)))
    stats = searcher.term_stats(terms)
    n = searcher.stats["num_docs"]
    avgdl = (searcher.stats["total_tokens"] / n) if n else 0.0
    idf = {
        t: math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for t, (df, _) in stats.items()
        if df > 0
    }
    top = searcher.topk(
        searcher.bm25_scores(query, k1=k1, b=b), k
    )  # (doc_id, score), k rows
    if not idf:
        return top.select(
            "doc_id",
            F.lit(None).cast("string").alias("term"),
            F.lit(None).cast("bigint").alias("tf"),
            F.lit(None).cast("bigint").alias("doc_len"),
            F.lit(None).cast("bigint").alias("df"),
            F.lit(None).cast("double").alias("idf"),
            F.lit(None).cast("double").alias("contrib"),
            "score",
        ).limit(0)
    p = searcher.postings_for(sorted(idf)).join(
        F.broadcast(top), "doc_id"
    )
    df_col = F.lit(None).cast("bigint")
    idf_col = F.lit(None).cast("double")
    for t in sorted(idf):
        df_col = F.when(F.col("term") == t, F.lit(stats[t][0])).otherwise(df_col)
        idf_col = F.when(F.col("term") == t, F.lit(idf[t])).otherwise(idf_col)
    norm_len = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(avgdl)
    )
    contrib = idf_col * F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm_len)
    return p.select(
        "doc_id",
        "term",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("doc_len").cast("bigint").alias("doc_len"),
        df_col.alias("df"),
        idf_col.alias("idf"),
        contrib.alias("contrib"),
        "score",
    )
