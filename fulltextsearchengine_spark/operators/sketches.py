"""Deterministic approximate-distinct sketches: hash-threshold
sampling (the classic adaptive-sampling / "distinct sampling" estimator
of Flajolet 1990 and Gibbons VLDB 2001 — public algorithms), chosen
over HyperLogLog / ``approx_count_distinct`` because it is exactly
reproducible: two engines hashing the same values agree digit-for-digit
(an md5 comparison and integer math — nothing engine-internal), so the
estimate itself is oracle-gateable and regression-diffable between
index generations, which a sketch whose value depends on register
layout never is.

    keep a value  v  iff  md5(v) starts below a hex threshold
    (first nibble < n  →  sampling fraction  p = n/16)
    est_distinct = round(count_distinct(sampled) / p)

Standard error ~ sqrt((1-p)/(p·D)) — at D = 10^9 distinct and
p = 1/16, well under 0.01%. The cost shape at 100 TB: the filter
prunes (16-n)/16 of the rows BEFORE the distinct aggregation's
exchange, so the only shuffle is over the sampled slice (drop p as D
grows: at 10^12 turns use a 2-3 hex-digit threshold, p = 16^-2..3,
and the "distinct" state is millions of rows, not trillions — the
bounded-state property that makes a distinct-count feasible in one
pass). The reference engine has no statistics surface at all (its
analysis chapter hand-computes corpus stats offline,
analysis/analysis.tex); report.py gives exact integers, this gives
the bounded-cost variant the exact report cannot afford at 10^12.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .index_build import InvertedIndex

# first-nibble threshold: md5 hex < this char keeps the value;
# "4" → p = 4/16 = 1/4 (the gate/test default, sized for tiny corpora)
DEFAULT_NIBBLE = 4


def _kept(value: Column, nibble: int) -> Column:
    """True iff the value's md5 falls in the sampled hash range."""
    if not 1 <= nibble <= 16:
        raise ValueError(f"nibble must be in 1..16, got {nibble}")
    return F.substring(F.md5(value.cast("string")), 1, 1) < F.lit(f"{nibble:x}")


def hash_threshold_distinct(
    df: DataFrame, value: Column, nibble: int = DEFAULT_NIBBLE
) -> DataFrame:
    """One row ``(n_sampled, est_distinct)``: distinct count of the
    hash-sampled slice, scaled by 16/nibble. Integer-exact math — any
    engine hashing the same values returns the same estimate."""
    kept = df.select(value.cast("string").alias("v")).filter(
        _kept(F.col("v"), nibble)
    )
    return kept.agg(
        F.count_distinct(F.col("v")).alias("n_sampled"),
        F.round(F.count_distinct(F.col("v")) * 16.0 / nibble)
        .cast("long")
        .alias("est_distinct"),
    )


def corpus_sketch_report(
    index: InvertedIndex, nibble: int = DEFAULT_NIBBLE
) -> DataFrame:
    """(entity, n_sampled, est_distinct) for the corpus cardinalities an
    operator would otherwise need a full distinct-shuffle to learn:
    vocabulary size, conversations, documents, and (term, doc) posting
    pairs — the last is the one that is genuinely infeasible exactly at
    10^12 turns. Deterministic: safe to diff across index generations
    (pair with index_report / index_diff)."""
    parts = [
        ("conv_id", index.docs.select(F.col("conv_id").alias("v"))),
        ("doc_id", index.docs.select(F.col("doc_id").alias("v"))),
        ("term", index.terms.select(F.col("term").alias("v"))),
        (
            "term_doc_pair",
            index.postings.select(
                F.concat_ws("|", F.col("term"), F.col("doc_id")).alias("v")
            ),
        ),
    ]
    out = None
    for name, frame in parts:
        one = hash_threshold_distinct(frame, F.col("v"), nibble).select(
            F.lit(name).alias("entity"), "n_sampled", "est_distinct"
        )
        out = one if out is None else out.unionByName(one)
    return out
