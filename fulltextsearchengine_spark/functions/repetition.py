"""Gopher-style repetition signals for training-data quality filtering
(Rae et al. 2021 §A1.1): per-document word n-gram repetition fractions.

For each n, over the document's token n-grams (joined with single
spaces, char mass = length of the joined gram):

- ``top_{n}gram_char_frac_micro`` — the largest single n-gram's share of
  total n-gram character mass: max over distinct grams of
  (count * len(gram)) / sum over all gram occurrences of len(gram).
- ``dup_{n}gram_char_frac_micro`` — the share of n-gram character mass
  sitting in grams that occur more than once.

Both are micro-scaled ints (× 1e6, rounded) so the values hash stably
against the DuckDB oracle.

Scale design: the whole computation is ROW-LOCAL — n-grams are built
with ``transform(sequence(...))``, and the duplicate/top counting is a
run-length scan over ``sort_array(grams)`` done inside a single
``aggregate`` higher-order function. Zero shuffles, zero Python, stays
in whole-stage codegen; at 100 TB this is a pure map over the corpus
scan (contrast: the naive explode→groupBy(doc_id, gram) formulation
shuffles every n-gram of every document).

The reference engine has no quality filtering (it indexes everything);
this extends the pipeline surface per the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tokenize import tokens_col

DEFAULT_NS = (2, 3, 4)


def _ngrams(tokens: Column, n: int) -> Column:
    """array<string> of space-joined word n-grams; empty when the doc has
    fewer than n tokens."""
    size = F.size(tokens)
    return F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - n + 1),
            lambda i: F.array_join(F.slice(tokens, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _run_length_masses(grams: Column) -> Column:
    """struct<best:long, dup:long, total:long> via a run-length scan over
    the sorted gram array: best = max over runs of run_len*len(gram),
    dup = sum over runs with run_len>1, total = sum over all grams.

    Single ``aggregate`` HOF — one pass, row-local, JVM-side."""
    sorted_g = F.sort_array(grams)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("total"),
    )

    def step(acc: Column, g: Column) -> Column:
        run_mass = acc["cnt"] * F.length(acc["prev"])
        closed_best = F.greatest(acc["best"], run_mass)
        closed_dup = acc["dup"] + F.when(acc["cnt"] > 1, run_mass).otherwise(F.lit(0))
        same = g == acc["prev"]
        return F.struct(
            g.alias("prev"),
            F.when(same, acc["cnt"] + 1).otherwise(F.lit(1).cast("long")).alias("cnt"),
            F.when(same, acc["best"]).otherwise(closed_best).alias("best"),
            F.when(same, acc["dup"]).otherwise(closed_dup).alias("dup"),
            (acc["total"] + F.length(g)).alias("total"),
        )

    def finish(acc: Column) -> Column:
        run_mass = acc["cnt"] * F.length(acc["prev"])
        return F.struct(
            F.greatest(acc["best"], run_mass).alias("best"),
            (acc["dup"] + F.when(acc["cnt"] > 1, run_mass).otherwise(F.lit(0))).alias("dup"),
            acc["total"].alias("total"),
        )

    return F.aggregate(sorted_g, zero, step, finish)


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = DEFAULT_NS
) -> DataFrame:
    """(+) top_{n}gram_char_frac_micro, dup_{n}gram_char_frac_micro for
    each n in ``ns``. Documents with fewer than n tokens score 0."""
    toks = tokens_col(F.col(text_col))
    out = df.withColumn("_toks", toks)
    for n in ns:
        m = _run_length_masses(_ngrams(F.col("_toks"), n))
        out = out.withColumn(f"_m{n}", m)
        total = F.col(f"_m{n}")["total"]
        out = out.withColumn(
            f"top_{n}gram_char_frac_micro",
            F.when(total > 0, F.round(F.col(f"_m{n}")["best"] / total * 1e6))
            .otherwise(F.lit(0))
            .cast("long"),
        ).withColumn(
            f"dup_{n}gram_char_frac_micro",
            F.when(total > 0, F.round(F.col(f"_m{n}")["dup"] / total * 1e6))
            .otherwise(F.lit(0))
            .cast("long"),
        )
    return out.drop("_toks", *[f"_m{n}" for n in ns])


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    max_top_2gram: float = 0.20,
    max_dup_3gram: float = 0.18,
) -> DataFrame:
    """Gopher-rule keep-filter: drop documents whose top-2-gram or
    duplicated-3-gram character fraction exceeds the thresholds
    (defaults from Rae et al. 2021 Table A1). Adds the stat columns."""
    out = with_repetition_stats(df, text_col, ns=(2, 3))
    return out.where(
        (F.col("top_2gram_char_frac_micro") <= int(max_top_2gram * 1e6))
        & (F.col("dup_3gram_char_frac_micro") <= int(max_dup_3gram * 1e6))
    )
