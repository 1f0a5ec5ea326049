"""Index health/statistics report — the operational `DESCRIBE INDEX`.

The reference's analysis chapter hand-computes corpus statistics for its
report (analysis/analysis.tex tables: review counts, token totals,
dictionary sizes); a production index needs them as a queryable,
regression-diffable artifact (post-build sanity gate, capacity planning,
drift detection between index generations — pair with merge_indexes /
purge_deletes to audit what an incremental fold changed).

All metrics are exact integers — no approximate percentiles — so two
engines (or two index generations that should match) compare by
equality, not tolerance. One pass over each already-tiny-or-aggregated
table; the only full-table touches are the terms aggregation (vocab-
sized) and two docs aggregations (map-side combining min/max/count).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index_build import InvertedIndex


def index_report(index: InvertedIndex) -> DataFrame:
    """(metric, value) rows, one per corpus/dictionary/layout statistic."""

    def named(df: DataFrame, **metrics: F.Column) -> DataFrame:
        agg = df.agg(*[c.cast("long").alias(m) for m, c in metrics.items()])
        stack = ", ".join(f"'{m}', {m}" for m in metrics)
        return agg.selectExpr(
            f"stack({len(metrics)}, {stack}) AS (metric, value)"
        )

    parts = [
        named(
            index.stats,
            num_docs=F.first("num_docs"),
            total_tokens=F.first("total_tokens"),
            unique_terms=F.first("unique_terms"),
            num_pairs=F.first("num_pairs"),
        ),
        named(
            index.docs,
            max_doc_len=F.max("doc_len"),
            min_doc_len=F.min("doc_len"),
            empty_docs=F.count(F.when(F.col("doc_len") == 0, 1)),
        ),
        named(
            index.terms,
            max_df=F.max("df"),
            hapax_terms=F.count(F.when(F.col("df") == 1, 1)),
            max_cf=F.max("cf"),
        ),
        named(
            index.conv_ranges,
            n_convs=F.count(F.lit(1)),
            max_conv_turns=F.max("n_docs"),
        ),
    ]
    return reduce(DataFrame.unionByName, parts)


def tool_usage_report(transcripts: DataFrame) -> DataFrame:
    """(tool, n_turns, n_convs, total_tokens, avg_turn_tokens_micro):
    per-tool usage over a transcript corpus (NULL tool — plain text
    turns — reports as its own 'none' bucket).

    The operational "what are the agents actually calling" question a
    transcript warehouse answers constantly: tool mix drift, token cost
    attribution per tool, dead-tool detection. One partial-agg groupBy
    on a handful of tool keys (map-side combine collapses each input
    partition to ≤|tools| rows before the shuffle — the same shape at
    100 TB)."""
    from ..functions.tokenize import tokens_col

    t = transcripts.select(
        F.coalesce(F.col("tool"), F.lit("none")).alias("tool"),
        "conv_id",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return t.groupBy("tool").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens") * 1e6).cast("long").alias("avg_turn_tokens_micro"),
    )


def source_quality_percentiles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(source, n_docs, p50/p90/p99 of token count, p50/p90/p99 of
    chars, ×1e6): EXACT linear-interpolated percentiles of document
    length per source stratum — the capacity/quality profile a mixture
    plan reads before setting per-source budgets.

    Exact percentile is a per-group sort — affordable because groups are
    source strata (few, large). At 100 TB prefer approx_percentile
    (t-digest, map-side mergeable, no group sort) for dashboards; this
    exact form is the auditable twin the approximate one is checked
    against on samples. Ships the exact one as the gate because two
    engines compare by equality."""
    from ..functions.tokenize import tokens_col

    d = docs.select(
        "source",
        F.size(tokens_col(F.col(text_col))).cast("double").alias("n_tok"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("double").alias("n_ch"),
    )
    def p(col: str, q: float, name: str):
        return F.round(F.percentile(F.col(col), F.lit(q)) * 1e6).cast("long").alias(name)

    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        p("n_tok", 0.5, "tok_p50_micro"),
        p("n_tok", 0.9, "tok_p90_micro"),
        p("n_tok", 0.99, "tok_p99_micro"),
        p("n_ch", 0.5, "chars_p50_micro"),
        p("n_ch", 0.9, "chars_p90_micro"),
        p("n_ch", 0.99, "chars_p99_micro"),
    )
