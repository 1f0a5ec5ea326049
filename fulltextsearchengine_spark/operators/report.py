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


def corpus_law_report(
    index: InvertedIndex, top_r: int = 100, heaps_points: int = 8
) -> DataFrame:
    """One row: (zipf_slope_micro, zipf_intercept_micro, heaps_beta_micro,
    heaps_logk_micro) — the two corpus-statistics power-law fits every
    collection profile reports (Manning/Raghavan/Schütze IIR §5.1):

      Zipf:  ln cf_r ≈ intercept + slope · ln r   over the top-``top_r``
             terms by cf (slope ≈ −1 for natural language; a synthetic
             or degenerate corpus shows up as a very different slope);
      Heaps: ln V(N) ≈ log_k + β · ln N — vocabulary growth against
             corpus size, measured at ``heaps_points`` doc_id-prefix
             checkpoints (β ≈ 0.5 for natural text; β drives dictionary
             capacity planning at 100 TB — it predicts the terms-table
             size of the next 10× of corpus).

    Both fits are closed-form OLS over a handful of (ln x, ln y) points,
    computed declaratively so the DuckDB twin runs the identical
    arithmetic. Plan shape: the Zipf side is TakeOrderedAndProject
    (top_r rows) off the vocab-sized terms table; the Heaps side is ONE
    vocab-sized agg over first-occurrence doc_ids (min(doc_id) per term
    — a map-side-combining groupBy) plus ONE docs-table agg with
    ``heaps_points`` conditional sums — no window over the corpus, no
    per-checkpoint rescan."""
    stats = index.stats_row()
    n_docs = int(stats["num_docs"])
    if n_docs < heaps_points:
        raise ValueError(f"need at least {heaps_points} docs, got {n_docs}")

    def ols(points: DataFrame, slope_name: str, icept_name: str) -> DataFrame:
        s = points.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        return s.select(
            F.round(slope * 1e6).cast("long").alias(slope_name),
            F.round(((F.col("sy") - slope * F.col("sx")) / F.col("n")) * 1e6)
            .cast("long")
            .alias(icept_name),
        )

    from pyspark.sql import Window

    # top_r rows post-limit: the rank window runs over a driver-sized frame
    top = index.terms.orderBy(F.desc("cf"), F.asc("term")).limit(top_r)
    w = Window.orderBy(F.desc("cf"), F.asc("term"))
    zipf_pts = top.withColumn("r", F.row_number().over(w)).select(
        F.log("r").alias("x"), F.log("cf").alias("y")
    )
    zipf = ols(zipf_pts, "zipf_slope_micro", "zipf_intercept_micro")

    # integer floor-division checkpoints — exact cross-engine semantics
    # (python round() is banker's; SQL round() is half-away)
    cuts = [max(1, (n_docs * i) // heaps_points) for i in range(1, heaps_points + 1)]
    first_doc = index.postings.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    vrow = first_doc.agg(
        *[
            F.count(F.when(F.col("first_doc") <= d, 1)).alias(f"v{i}")
            for i, d in enumerate(cuts)
        ]
    )
    nrow = index.docs.agg(
        *[
            F.sum(F.when(F.col("doc_id") <= d, F.col("doc_len"))).alias(f"n{i}")
            for i, d in enumerate(cuts)
        ]
    )
    stack = ", ".join(f"ln(n{i}), ln(v{i})" for i in range(len(cuts)))
    heaps_pts = vrow.crossJoin(nrow).selectExpr(
        f"stack({len(cuts)}, {stack}) AS (x, y)"
    )
    heaps = ols(heaps_pts, "heaps_beta_micro", "heaps_logk_micro")
    return zipf.crossJoin(heaps)


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
