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
