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


__all__ = ["clean_corpus", "corpus_report", "token_budget"]
