"""Index integrity checker — `fsck` for a persisted inverted index.

Segments at 10^12-turn scale arrive from many producers (batch builds,
streaming segments, compaction, merges, upserts, purges); every one of
those paths promises the same invariants, and this operator is the
post-hoc audit that a segment actually holds them before it serves
traffic (the Lucene CheckIndex analog). Complements the per-path pytest
identity tests: those pin the code, this pins a given ARTIFACT.

Checks (each one distributed aggregation; names are the output rows):
  docid_dups        doc_ids assigned more than once
  docid_gaps        holes in the dense 1..N doc_id range
  conv_contiguity   conversations whose doc_ids are not one contiguous
                    run of length n_docs matching conv_ranges
  posting_doclen    postings rows whose denormalized doc_len disagrees
                    with the docs table
  term_df           dictionary rows whose df disagrees with the actual
                    posting count
  term_cf           dictionary rows whose cf disagrees with Σ tf
  stats_fields      global-stats fields disagreeing with recomputation

A healthy index reports 0 violations on every row. Cost: ~one scan per
table with map-side-combined aggs — run it once per produced segment,
not per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index_build import InvertedIndex


def index_check(index: InvertedIndex) -> DataFrame:
    """(check string, violations bigint) — one row per invariant,
    violations == 0 everywhere for a well-formed index."""
    spark = index.docs.sparkSession
    d = index.docs

    dup_gap = d.agg(
        (F.count("*") - F.countDistinct("doc_id")).alias("dups"),
        (
            F.max("doc_id") - F.min("doc_id") + 1 - F.countDistinct("doc_id")
        ).alias("gaps"),
    ).collect()[0]

    # conv contiguity vs conv_ranges: per conv the doc_ids must be the
    # full [min, max] run, and conv_ranges must agree row-for-row
    per_conv = d.groupBy("conv_id").agg(
        F.min("doc_id").alias("c_from"),
        F.max("doc_id").alias("c_to"),
        F.count("*").alias("c_n"),
    )
    conv_bad = (
        per_conv.join(index.conv_ranges, "conv_id", "full_outer")
        .filter(
            ~(
                (F.col("c_from") == F.col("from_doc_id"))
                & (F.col("c_to") == F.col("to_doc_id"))
                & (F.col("c_n") == F.col("n_docs"))
                & (F.col("c_to") - F.col("c_from") + 1 == F.col("c_n"))
            )
        )
        .count()
    )

    posting_doclen = (
        index.postings.alias("p")
        .join(d.select("doc_id", F.col("doc_len").alias("d_len")), "doc_id")
        .filter(F.col("p.doc_len") != F.col("d_len"))
        .count()
    )

    actual_terms = index.postings.groupBy("term").agg(
        F.count("*").alias("a_df"), F.sum("tf").alias("a_cf")
    )
    tj = index.terms.join(actual_terms, "term", "full_outer")
    term_df_bad = tj.filter(
        F.col("df").isNull()
        | F.col("a_df").isNull()
        | (F.col("df") != F.col("a_df"))
    ).count()
    term_cf_bad = tj.filter(
        F.col("cf").isNull()
        | F.col("a_cf").isNull()
        | (F.col("cf") != F.col("a_cf"))
    ).count()

    st = index.stats_row()
    recomputed = {
        "total_tokens": d.agg(F.sum("doc_len")).collect()[0][0] or 0,
        "num_docs": d.count(),
        "unique_terms": index.terms.count(),
        "num_pairs": index.postings.count(),
    }
    stats_bad = sum(
        1 for k, v in recomputed.items() if k in st and int(st[k] or 0) != int(v)
    )

    rows = [
        ("docid_dups", int(dup_gap["dups"] or 0)),
        ("docid_gaps", int(dup_gap["gaps"] or 0)),
        ("conv_contiguity", int(conv_bad)),
        ("posting_doclen", int(posting_doclen)),
        ("term_df", int(term_df_bad)),
        ("term_cf", int(term_cf_bad)),
        ("stats_fields", int(stats_bad)),
    ]
    return spark.createDataFrame(rows, schema="check string, violations long")


def index_term_diff(terms_a: DataFrame, terms_b: DataFrame) -> DataFrame:
    """Dictionary-level diff between two index versions — the ops
    audit for reindex / upsert / compaction / purge ("what did this
    rebuild change?"): (term, df_a, cf_a, df_b, cf_b, df_delta,
    cf_delta, status ∈ {added, removed, changed}), unchanged terms
    suppressed so the report is change-sized, not vocabulary-sized.

    ``added``/``removed`` are relative to B (the new version): a term
    only in B was added. One full-outer join of two vocabulary-sized
    tables — broadcast/AQE territory, never touches postings."""
    a = terms_a.select(
        "term", F.col("df").alias("df_a"), F.col("cf").alias("cf_a")
    )
    b = terms_b.select(
        "term", F.col("df").alias("df_b"), F.col("cf").alias("cf_b")
    )
    j = a.join(b, "term", "full_outer")
    status = (
        F.when(F.col("df_a").isNull(), F.lit("added"))
        .when(F.col("df_b").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(
            "term",
            F.coalesce("df_a", F.lit(0)).cast("long").alias("df_a"),
            F.coalesce("cf_a", F.lit(0)).cast("long").alias("cf_a"),
            F.coalesce("df_b", F.lit(0)).cast("long").alias("df_b"),
            F.coalesce("cf_b", F.lit(0)).cast("long").alias("cf_b"),
            status.alias("status"),
        )
        .withColumn("df_delta", F.col("df_b") - F.col("df_a"))
        .withColumn("cf_delta", F.col("cf_b") - F.col("cf_a"))
        .filter((F.col("df_delta") != 0) | (F.col("cf_delta") != 0))
    )
