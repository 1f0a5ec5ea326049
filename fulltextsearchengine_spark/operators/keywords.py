"""Per-conversation keyword extraction (tf-idf top-k) and corpus-level
term co-occurrence / PMI — analytical queries over the finished index.

Neither exists in the reference (its query surface is the three
scorers, ReviewSearch.java), but both are standard IR analytics a
transcript-corpus owner runs on exactly the tables we already maintain
— they are index CONSUMERS, demonstrating the columnar index doubles as
an analytical fact table (SURVEY §4's argument for flat postings).

``conv_keywords`` — top-k terms per conversation by tf-idf:
  score(t, c) = (Σ tf over c's turns) · ln(N / df_t).
  Plan shape at 10^12 turns: postings⋈docs is a join of two big tables
  on doc_id (one shuffle each — or zero if both are bucketed by doc_id
  at write time); the (conv, term) partial agg combines map-side; the
  df join shuffles on term (AQE broadcasts it at small vocab); the
  per-conv top-k is a window over the conv partitioning that already
  exists after the agg. Ordering key is the integer micro-score, so
  ranks are reproducible across engines (no float tie ambiguity).

``term_cooccurrence`` — top-k co-occurring term pairs with PMI over a
  df-banded vocabulary:
  pmi(a,b) = ln(N · c_ab / (df_a · df_b)), c_ab = #docs containing both.
  The df band [min_df, max_df] is the scalability contract: it bounds
  the per-doc banded-term count, so the doc_id self-join's fan-out is
  bounded (without it, hot terms make the pair expansion quadratic —
  same reasoning as the Jaccard cap, dedup.py). Band membership comes
  from the terms table (broadcastable after banding); the pair
  expansion shuffles once on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .index_build import InvertedIndex


def conv_keywords(index: InvertedIndex, k: int = 3) -> DataFrame:
    """(conv_id, term, tf_sum, score_micro, rank): top-k tf-idf terms
    per conversation; rank by score_micro desc, term asc."""
    n_docs = F.lit(int(index.stats_row()["num_docs"]))
    conv_tf = (
        index.postings.select("term", "doc_id", "tf")
        .join(index.docs.select("doc_id", "conv_id"), "doc_id")
        .groupBy("conv_id", "term")
        .agg(F.sum("tf").alias("tf_sum"))
    )
    scored = conv_tf.join(index.terms.select("term", "df"), "term").select(
        "conv_id",
        "term",
        "tf_sum",
        F.round(F.col("tf_sum") * F.log(n_docs / F.col("df")) * 1e6)
        .cast("long")
        .alias("score_micro"),
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("score_micro"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("conv_id", "term", "tf_sum", "score_micro", "rank")
    )


def term_trends(
    index: InvertedIndex, granularity: str = "hour", k: int = 3
) -> DataFrame:
    """(bucket_ts, term, tf_sum, rank): top-k terms per time bucket by
    summed tf — the corpus-drift monitor (vocabulary shift between
    ingestion windows is the first signal a training-data pipeline
    alarms on). Same plan shape as conv_keywords with the conv key
    replaced by ``date_trunc(granularity, ts)``: postings⋈docs, map-side
    partial agg, per-bucket window. Rank ties break by term asc."""
    bucketed = (
        index.postings.select("term", "doc_id", "tf")
        .join(index.docs.select("doc_id", "ts"), "doc_id")
        .groupBy(
            F.date_trunc(granularity, F.col("ts")).alias("bucket_ts"), F.col("term")
        )
        .agg(F.sum("tf").alias("tf_sum"))
    )
    w = Window.partitionBy("bucket_ts").orderBy(F.desc("tf_sum"), F.asc("term"))
    return (
        bucketed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("bucket_ts", "term", "tf_sum", "rank")
    )


def term_cooccurrence(
    index: InvertedIndex, min_df: int, max_df: int, k: int = 50
) -> DataFrame:
    """(term_a, term_b, pair_count, pmi_micro): top-k same-doc term
    pairs within the df band, by pair_count desc then (term_a, term_b)
    asc. term_a < term_b canonical order."""
    n_docs = int(index.stats_row()["num_docs"])
    banded_terms = index.terms.filter(
        (F.col("df") >= min_df) & (F.col("df") <= max_df)
    ).select("term", "df")
    # posting side pruned to the band before the pair expansion
    banded = index.postings.select("term", "doc_id").join(
        F.broadcast(banded_terms), "term"
    )
    a = banded.select(
        F.col("doc_id"), F.col("term").alias("term_a"), F.col("df").alias("df_a")
    )
    b = banded.select(
        F.col("doc_id"), F.col("term").alias("term_b"), F.col("df").alias("df_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "df_a", "df_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    return (
        pairs.select(
            "term_a",
            "term_b",
            "pair_count",
            F.round(
                F.log(F.lit(float(n_docs)) * F.col("pair_count") / (F.col("df_a") * F.col("df_b")))
                * 1e6
            )
            .cast("long")
            .alias("pmi_micro"),
        )
        .orderBy(F.desc("pair_count"), F.asc("term_a"), F.asc("term_b"))
        .limit(k)
    )
