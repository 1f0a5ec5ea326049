"""Corpus distribution drift: per-term Jensen–Shannon divergence
between two document slices.

An always-ingesting training-data pipeline needs to know when the
incoming distribution moves — a crawler picking up a new site cluster,
a language mix shifting, boilerplate flooding in. The standard monitor
is the Jensen–Shannon divergence between the token unigram
distributions of two corpus snapshots (symmetric, bounded, defined even
where one side has zero mass), decomposed PER TERM so the report names
what drifted, not just that something did (the same decomposition
population-stability-index dashboards use).

    JSD(p‖q) = Σ_t 0.5·( p_t·ln(p_t/m_t) + q_t·ln(q_t/m_t) ),
    m = (p+q)/2

with add-one smoothing over the UNION vocabulary so both sides are
strictly positive and the per-term contribution is finite. Natural log
(nats) on both engines — no log2 implementation drift.

Scale shape: one map-side-combined token count per slice (the postings
build's own shape), a vocabulary-sized full-outer join, and a bounded
top-k heap. Nothing corpus-sized shuffles twice; the report output is
top_k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col


def _term_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def corpus_drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """(term, cnt_a, cnt_b, jsd_nano): the ``top_k`` terms contributing
    most JSD between slice A's and slice B's unigram distributions,
    ordered by contribution desc then term asc. ``jsd_nano`` is the
    per-term contribution in nats × 1e9 (contributions are tiny at
    large vocabularies; nano-ints keep them hashable cross-engine).

    Probabilities are add-one smoothed over the union vocabulary:
    p_t = (cnt_a + 1) / (N_a + V), likewise q — a term absent from one
    side still contributes (that absence IS drift)."""
    if top_k <= 0:
        raise ValueError(f"top_k must be ≥ 1, got {top_k}")
    ca = _term_counts(df_a, text_col).withColumnRenamed("cnt", "cnt_a")
    cb = _term_counts(df_b, text_col).withColumnRenamed("cnt", "cnt_b")
    both = (
        ca.join(cb, "term", "full_outer")
        .select(
            "term",
            F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        )
    )
    totals = both.agg(
        F.sum("cnt_a").alias("na"),
        F.sum("cnt_b").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    scored = both.crossJoin(F.broadcast(totals)).select(
        "term",
        "cnt_a",
        "cnt_b",
        (
            (F.col("cnt_a") + 1).cast("double") / (F.col("na") + F.col("v"))
        ).alias("p"),
        (
            (F.col("cnt_b") + 1).cast("double") / (F.col("nb") + F.col("v"))
        ).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    contrib = F.lit(0.5) * (
        F.col("p") * F.log(F.col("p") / m) + F.col("q") * F.log(F.col("q") / m)
    )
    out = scored.select(
        "term",
        "cnt_a",
        "cnt_b",
        F.round(contrib * 1e9).cast("long").alias("jsd_nano"),
        contrib.alias("_c"),
    )
    return (
        out.orderBy(F.desc("_c"), F.asc("term"))
        .limit(top_k)
        .drop("_c")
    )
