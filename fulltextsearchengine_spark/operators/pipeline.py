"""Composed training-data cleaning pipeline over a document corpus.

Not in the reference (it's a search engine); this is the canonical
LLM-corpus preparation flow the engine's operators exist to serve,
expressed as ONE declarative DataFrame chain so Catalyst fuses the
quality/lang/token predicates into a single scan pass and the only
shuffles are the two the semantics require (dedup hash-groupBy; report
aggregation):

    quality signals → threshold filter → language filter →
    exact dedup (first-wins) → per-language corpus report

Filters compare the micro-scaled BIGINT signal columns (not raw
doubles) so the decision boundary is bit-identical across engines —
the same trick the gate queries use for score hashing.

At 100 TB: the filter stage is embarrassingly parallel (no shuffle,
pushed to the scan); dedup shuffles once on md5(text) — uniformly
distributed keys, no skew; the report is a partial-agg'd rollup over
the survivors. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textstats import with_lang_id, with_quality, with_token_counts
from ..operators.dedup import canonical_text_hash


def clean_corpus(
    df: DataFrame,
    min_tokens: int = 20,
    min_uniq_ratio_micro: int = 350_000,
    max_punct_ratio_micro: int = 400_000,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Survivors of quality → language → exact-dedup filtering, with
    their signal columns. First-wins dedup: the smallest doc_id of each
    canonical-text group is kept (same canonicalization as
    dedup.exact_dedup — tokenized, case-folded, punctuation-split)."""
    sig = with_lang_id(with_quality(df, text_col=text_col), text_col=text_col)
    kept = sig.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("uniq_ratio_micro") >= min_uniq_ratio_micro)
        & (F.col("punct_ratio_micro") <= max_punct_ratio_micro)
        & F.col("lang_pred").isin(list(langs))
    )
    hashed = kept.withColumn("text_hash", canonical_text_hash(F.col(text_col)))
    w_min = F.min(id_col).over(Window.partitionBy("text_hash"))
    return (
        hashed.withColumn("_canon", w_min)
        .filter(F.col(id_col) == F.col("_canon"))
        .drop("_canon")
    )


def corpus_report(cleaned: DataFrame) -> DataFrame:
    """Per-language rollup of a cleaned corpus: doc count, total/mean
    tokens, mean quality ratios (micro)."""
    return cleaned.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens") * 1e6).cast("long").alias("mean_tokens_micro"),
        F.round(F.avg("uniq_ratio_micro")).cast("long").alias("mean_uniq_ratio_micro"),
        F.round(F.avg("punct_ratio_micro")).cast("long").alias("mean_punct_ratio_micro"),
    )


def token_budget(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level token accounting (whitespace + engine tokenizer):
    the 'how many training tokens do we have' single-row answer."""
    t = with_token_counts(df, text_col=text_col)
    return t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws_tokens").alias("ws_tokens"),
        F.sum("n_alnum_tokens").alias("alnum_tokens"),
        F.sum("n_chars").alias("chars"),
    )


def curation_funnel(
    df: DataFrame,
    lm,
    min_tokens: int = 20,
    min_uniq_ratio_micro: int = 350_000,
    max_punct_ratio_micro: int = 400_000,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stage retention report of the full curation chain — the
    funnel table every corpus-curation writeup publishes:

        1 quality   → 2 language → 3 exact_dedup → 4 lm_ppl

    Returns (stage_idx, stage, n_in, n_out), n_in of stage s = n_out of
    s−1. Stage 4 keeps docs whose bigram-LM cross-entropy (``lm`` =
    ngram_lm.BigramLM, trained wherever the caller chose) is at or
    below the MEAN xent of the stage-3 survivors — compared in exact
    integer arithmetic (xent_micro·n ≤ Σxent_micro), so the boundary is
    bit-identical across engines with no float-percentile ambiguity.

    Scale shape: stage flags are row-local (one scan); the dedup flag
    is the same text_hash window clean_corpus uses; xent joins the
    LM-scored table on doc_id. Counting needs the survivor mean before
    the stage-4 count, so the flagged frame is evaluated twice (two
    aggregate jobs) — at 100 TB persist it between the two passes or
    accept the second scan; nothing collects beyond two 1-row aggs.
    """
    from .ngram_lm import bigram_xent

    sig = with_lang_id(with_quality(df, text_col=text_col), text_col=text_col)
    q_ok = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("uniq_ratio_micro") >= min_uniq_ratio_micro)
        & (F.col("punct_ratio_micro") <= max_punct_ratio_micro)
    )
    l_ok = F.col("lang_pred").isin(list(langs))
    flagged = (
        sig.withColumn("_q", q_ok)
        .withColumn("_l", q_ok & l_ok)
        .withColumn("text_hash", canonical_text_hash(F.col(text_col)))
    )
    # first-wins among stage-2 survivors only (same semantics as
    # clean_corpus: dedup runs after the filters)
    w = Window.partitionBy("text_hash")
    canon_min = F.min(F.when(F.col("_l"), F.col(id_col))).over(w)
    flagged = flagged.withColumn(
        "_d", F.col("_l") & (F.col(id_col) == canon_min)
    )
    xent = bigram_xent(df, lm, text_col=text_col, id_col=id_col).select(
        id_col, "xent_micro"
    )
    flagged = flagged.join(xent, id_col, "left")
    base = flagged.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("_q").cast("long")).alias("n1"),
        F.sum(F.col("_l").cast("long")).alias("n2"),
        F.sum(F.col("_d").cast("long")).alias("n3"),
        F.sum(F.when(F.col("_d"), F.col("xent_micro"))).alias("xsum"),
    ).collect()[0]
    n3, xsum = int(base["n3"]), int(base["xsum"] or 0)
    n4 = (
        flagged.filter(
            F.col("_d") & (F.col("xent_micro") * F.lit(n3) <= F.lit(xsum))
        ).count()
        if n3
        else 0
    )
    spark = df.sparkSession
    rows = [
        (1, "quality", int(base["n0"]), int(base["n1"])),
        (2, "language", int(base["n1"]), int(base["n2"])),
        (3, "exact_dedup", int(base["n2"]), n3),
        (4, "lm_ppl", n3, int(n4)),
    ]
    return spark.createDataFrame(
        rows, "stage_idx int, stage string, n_in long, n_out long"
    )


__all__ = ["clean_corpus", "corpus_report", "curation_funnel", "token_budget"]
