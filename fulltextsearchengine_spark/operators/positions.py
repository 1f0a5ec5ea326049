"""Opt-in positional postings + phrase search — the extension SURVEY
§10.1 designs but the core index deliberately omits.

The reference stores no positions (inverted_index/PostingListWriter.java
writes gap+tf streams only; no query accepts a phrase) and the core
engine matches that surface exactly. This module is the flag-gated
side-table for consumers who need phrases: a PARALLEL
``postings_positional`` table ``(term, doc_id, tf, positions:
array<int>)`` — the core postings/terms/stats tables are untouched, so
bag-of-words queries pay zero cost for its existence.

Build shape: one ``posexplode`` pass over the tokenized turns and one
shuffle on (term, doc_id) — identical shape to the core A1 invert; the
positions array is ``sort_array(collect_list(pos))`` (1-based ascending,
so delta-encoding them with the existing varint codecs is a drop-in if
the table is ever block-compressed). Expect ~avg_tf× the core postings
bytes — the size cost §10.1 cites as the reason this is opt-in.

Phrase query: candidates are the pivoted per-slot position arrays of the
phrase's terms (same ≤|q|-column pivot as the scorers — pruned ``In``
scan, one doc_id shuffle); a doc matches where the slot arrays, each
shifted left by its slot offset, intersect: ``array_intersect(pos_0,
pos_1 − 1, …, pos_{n−1} − (n−1))`` yields the phrase start positions,
its size the phrase tf. Pure Catalyst array math — no explode of
positions, no UDF, and repeated terms in the phrase are handled for
free (the same sorted array participates at both slots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from .docid import assign_doc_ids


def build_positional_postings(
    transcripts: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """transcripts → (term, doc_id, tf, positions array<int> 1-based
    ascending). docIDs are the same stable (conv_id, turn_idx) dense
    assignment as the core build, so the side-table joins/unions cleanly
    with the core index tables."""
    with_ids = assign_doc_ids(transcripts, num_partitions=num_partitions)
    toks = with_ids.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos0", "term")
    )
    return (
        toks.groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list(F.col("pos0") + 1)).alias("positions"))
        .select(
            "term", "doc_id", F.size("positions").alias("tf"), "positions"
        )
    )


def save_positional_postings(
    pos_postings: DataFrame, path: str, num_partitions: int | None = None
) -> None:
    """Persist the side-table in the same layout contract as the core
    postings sink (index_build S6): range-exchange on (term, doc_id) +
    in-partition sort, so per-query term lookups prune parquet files and
    row groups by min/max — the dictionary-binary-search analog. zstd
    like every index artifact."""
    from .index_build import PARQUET_CODEC

    spark = pos_postings.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    (
        pos_postings.repartitionByRange(n, "term", "doc_id")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .option("compression", PARQUET_CODEC)
        .parquet(path)
    )


def load_positional_postings(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def phrase_match_docs(pos_postings: DataFrame, phrase: list[str]) -> DataFrame:
    """Unranked exact-adjacency matches: (doc_id, phrase_tf) for every
    doc containing the phrase — the filter-clause form (queryparse.py
    semi/anti-joins it; no sort, no limit)."""
    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("empty phrase")
    distinct = sorted(set(terms))
    p = pos_postings.filter(F.col("term").isin(distinct))
    piv = p.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("positions"))).alias(f"pos_{i}")
            for i, t in enumerate(distinct)
        ]
    )
    slot = {t: i for i, t in enumerate(distinct)}

    def _shift(col: F.Column, off: int) -> F.Column:
        # NB: a 2-arg lambda to F.transform means (element, INDEX) —
        # bind the offset outside the lambda
        return F.transform(col, lambda pth: pth - F.lit(off))

    starts = F.col(f"pos_{slot[terms[0]]}")
    for off, t in enumerate(terms[1:], start=1):
        starts = F.array_intersect(starts, _shift(F.col(f"pos_{slot[t]}"), off))
    return piv.select("doc_id", F.size(starts).alias("phrase_tf")).filter(
        F.col("phrase_tf") > 0
    )


def phrase_search(
    pos_postings: DataFrame, phrase: list[str], k: int = 20
) -> DataFrame:
    """Exact-adjacency phrase top-k: (doc_id, phrase_tf), phrase_tf desc
    then doc_id asc. phrase_tf = number of occurrences of the full
    phrase (terms at consecutive positions, in order)."""
    return (
        phrase_match_docs(pos_postings, phrase)
        .orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
        .limit(k)
    )
