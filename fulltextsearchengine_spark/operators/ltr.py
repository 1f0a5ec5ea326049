"""Learning-to-rank feature extraction: per-(query, candidate) feature
vectors for training a re-ranker — the batch feature-engineering step
between first-stage retrieval and model training.

The reference stops at its three scorers (ReviewSearch.java); a search
stack that trains a ranker (LambdaMART, a cross-encoder distillation,
…) needs the classic feature table (LETOR/MSLR shape): for each query
and each candidate from first-stage retrieval, a fixed-width numeric
vector combining query-dependent signals (BM25, term coverage, tf/idf
mass) and query-independent ones (doc length, recency, position).

Features (all exact-integer or micro-int — reproducible across
engines, the keywords.py contract):

  bm25_micro   first-stage BM25 score ×1e6 (also the candidate source)
  rank         first-stage rank (1-based)
  tf_sum       Σ tf of query terms in the doc
  matched      distinct query terms present
  coverage_micro  matched / |distinct query terms| ×1e6
  idf_sum_micro   Σ ln(N/df) over MATCHED terms ×1e6 (rarity mass)
  doc_len      token length (the BM25 normalizer, exposed raw)
  turn_idx     position inside the conversation
  age_days     floor days between an EXPLICIT ``now`` and doc ts
               (recency.py's no-wall-clock contract; NULL ts → -1)

100-TB plan shape: candidates = one bm25_search_batch job (broadcast
query frame ⋈ pruned postings scan, per-query bounded window); the
feature joins touch candidates only — postings are re-read ONCE with
the same pushed In(term) filter for tf/matched/idf, and docs join on
doc_id for len/turn/ts. Output is |queries|·k rows: eval-set-sized,
never corpus-sized.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import Searcher, normalize_query


def ltr_features(
    searcher: Searcher,
    queries: dict[str, list[str]],
    k: int = 100,
    now: str | None = None,
) -> DataFrame:
    """(query_id, doc_id, bm25_micro, rank, tf_sum, matched,
    coverage_micro, idf_sum_micro, doc_len, turn_idx, age_days):
    LTR feature table over the BM25 top-k candidates per query.

    ``now`` is an explicit 'YYYY-MM-DD HH:MM:SS' anchor for age_days
    (never wall-clock — features must be reproducible); None disables
    the recency feature (age_days = -1 everywhere).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    spark = searcher.index.postings.sparkSession

    cands = searcher.bm25_search_batch(queries, k).select(
        "query_id",
        "doc_id",
        F.round(F.col("score") * 1e6).cast("long").alias("bm25_micro"),
        F.col("rank").cast("int").alias("rank"),
    )

    # query-term frame with driver-side idf (term_stats = pruned tiny scan)
    qnorm = {qid: sorted(set(normalize_query(ts))) for qid, ts in queries.items()}
    all_terms = sorted({t for ts in qnorm.values() for t in ts})
    stats = searcher.term_stats(all_terms)
    n = searcher.stats["num_docs"]
    rows = [
        (qid, t, math.log(n / stats[t][0]), len(ts))
        for qid, ts in qnorm.items()
        for t in ts
        if t in stats
    ]
    feat = cands
    if rows:
        qdf = spark.createDataFrame(
            rows, "query_id string, term string, idf double, n_qterms int"
        )
        p = searcher.index.postings.filter(
            F.col("term").isin(sorted({r[1] for r in rows}))
        )
        qstats = (
            p.join(F.broadcast(qdf), "term")
            .groupBy("query_id", "doc_id")
            .agg(
                F.sum("tf").alias("tf_sum"),
                F.countDistinct("term").alias("matched"),
                F.round(F.sum("idf") * 1e6).cast("long").alias("idf_sum_micro"),
                F.first("n_qterms").alias("n_qterms"),
            )
        )
        feat = feat.join(qstats, ["query_id", "doc_id"], "left")
    else:
        feat = (
            feat.withColumn("tf_sum", F.lit(None).cast("long"))
            .withColumn("matched", F.lit(None).cast("long"))
            .withColumn("idf_sum_micro", F.lit(None).cast("long"))
            .withColumn("n_qterms", F.lit(None).cast("int"))
        )

    age = (
        F.when(
            F.col("ts").isNotNull(),
            F.floor(
                (F.unix_timestamp(F.lit(now)) - F.unix_timestamp(F.col("ts")))
                / F.lit(86400.0)
            ),
        ).otherwise(F.lit(-1))
        if now is not None
        else F.lit(-1)
    )
    docs = searcher.index.docs.select(
        "doc_id", "doc_len", "turn_idx", age.cast("long").alias("age_days")
    )
    return feat.join(docs, "doc_id").select(
        "query_id",
        "doc_id",
        "bm25_micro",
        "rank",
        F.coalesce("tf_sum", F.lit(0)).cast("long").alias("tf_sum"),
        F.coalesce("matched", F.lit(0)).cast("long").alias("matched"),
        F.coalesce(
            F.round(F.col("matched") / F.col("n_qterms") * 1e6).cast("long"),
            F.lit(0),
        ).alias("coverage_micro"),
        F.coalesce("idf_sum_micro", F.lit(0)).cast("long").alias("idf_sum_micro"),
        F.col("doc_len").cast("long").alias("doc_len"),
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "age_days",
    )
