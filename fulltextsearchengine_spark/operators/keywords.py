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

``significant_terms`` — the ES significant_terms aggregation: terms
  over-represented in a document slice vs the whole corpus (JLH score).
  Slice selector is a Column predicate on docs, so it pushes into the
  scan; everything after the first agg is vocab-sized.

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


def significant_terms(
    index: InvertedIndex,
    foreground: F.Column,
    k: int = 20,
    min_fg_df: int = 2,
) -> DataFrame:
    """(term, fg_df, df, jlh_micro): top-k terms over-represented in the
    foreground document set vs the whole corpus — the Elasticsearch
    significant_terms aggregation (the "what is DIFFERENT about this
    slice" question: per-tool vocabularies, per-role phrasing, drift in
    one source stratum), scored by JLH:

        jlh = (fgp − bgp) · (fgp / bgp),
        fgp = fg_df / |fg docs|,  bgp = df / num_docs

    — the product of the absolute rate change (favors common terms) and
    the relative lift (favors rare ones). Ranked by jlh_micro desc, term
    asc; ``min_fg_df`` drops one-off noise terms.

    ``foreground`` is a Column predicate over the docs table's columns
    (role/tool/turn_idx/conv_id/ts/doc_len), so the selector pushes into
    the docs scan.

    Plan shape at 100 TB: fg doc_ids ⋈ postings on doc_id (ONE shuffle;
    Spark broadcasts the fg side when the slice is small), map-side
    partial (term) agg to vocab-sized rows, then a term join against the
    vocab-sized terms table (AQE broadcast). No corpus-sized frame
    survives past the first agg. The fg-size count is one metadata-light
    aggregate."""
    n_docs = int(index.stats_row()["num_docs"])
    fg_docs = index.docs.filter(foreground).select("doc_id")
    fg_size = fg_docs.count()
    if fg_size == 0:
        raise ValueError("foreground selects no documents")
    fg = (
        index.postings.select("term", "doc_id")
        .join(fg_docs, "doc_id")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
        .filter(F.col("fg_df") >= min_fg_df)
    )
    fgp = F.col("fg_df") / F.lit(float(fg_size))
    bgp = F.col("df") / F.lit(float(n_docs))
    return (
        fg.join(index.terms.select("term", "df"), "term")
        .select(
            "term",
            "fg_df",
            "df",
            F.round((fgp - bgp) * (fgp / bgp) * 1e6).cast("long").alias("jlh_micro"),
        )
        .orderBy(F.desc("jlh_micro"), F.asc("term"))
        .limit(k)
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
