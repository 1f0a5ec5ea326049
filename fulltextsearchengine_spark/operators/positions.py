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

from pyspark.sql import DataFrame, Window
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


def min_window_spans(pos_postings: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, min_span): smallest position window containing ALL
    distinct query terms, for every doc that contains all of them —
    the INQUERY/Indri unordered-window (#uwN) primitive and Clarke et
    al.'s minimal "cover" (public IR operators). NOTE: unordered
    semantics, not Lucene's move-based phrase slop — documented
    deviation; for ordered adjacency use ``phrase_search``.

    Plan shape: pruned ``In(term,…)`` scan of the positional
    side-table → explode positions for the ≤|q| terms (candidate docs
    only) → ONE doc_id-keyed sort window computing per-slot last-seen
    positions (the classic min-window two-pointer, vectorized as m
    running MAX-FILTER columns) → span at each merged position →
    map-side-combined min per doc. The window and the final agg share
    the doc_id partitioning, so this costs one exchange over
    query-term rows only.
    """
    terms = sorted({t.lower() for t in terms})
    if not terms:
        raise ValueError("empty term list")
    m = len(terms)
    slot_arr = F.array(*[F.lit(t) for t in terms])
    ex = (
        pos_postings.filter(F.col("term").isin(terms))
        .select(
            "doc_id",
            F.array_position(slot_arr, F.col("term")).alias("slot"),
            F.explode("positions").alias("pos"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lasts = [
        F.max(F.when(F.col("slot") == i + 1, F.col("pos"))).over(w).alias(f"l{i}")
        for i in range(m)
    ]
    spanned = ex.select("doc_id", "pos", *lasts)
    all_seen = spanned["l0"].isNotNull()
    for i in range(1, m):
        all_seen = all_seen & spanned[f"l{i}"].isNotNull()
    # least() skips NULLs, so gate on every slot seen first (m=1:
    # least of one column is the column itself — least() requires ≥2)
    earliest = (
        F.col("l0")
        if m == 1
        else F.least(*[F.col(f"l{i}") for i in range(m)])
    )
    span = F.when(all_seen, F.col("pos") - earliest + 1)
    return (
        spanned.select("doc_id", span.alias("span"))
        .groupBy("doc_id")
        .agg(F.min("span").alias("min_span"))
        .filter(F.col("min_span").isNotNull())
        .select("doc_id", F.col("min_span").cast("long").alias("min_span"))
    )


def unordered_window_search(
    pos_postings: DataFrame,
    terms: list[str],
    slop: int = 0,
    k: int = 20,
) -> DataFrame:
    """Top-k docs whose minimal window over the distinct query terms is
    ≤ m + slop positions (slop=0 ⇒ the terms are consecutive in SOME
    order), tightest-window-first then doc_id asc. The proximity
    filter-clause of the search-box language family."""
    if slop < 0:
        raise ValueError(f"slop must be ≥ 0, got {slop}")
    m = len({t.lower() for t in terms})
    return (
        min_window_spans(pos_postings, terms)
        .filter(F.col("min_span") <= m + slop)
        .orderBy(F.asc("min_span"), F.asc("doc_id"))
        .limit(k)
    )


def ordered_window_spans(
    pos_postings: DataFrame, terms: list[str]
) -> DataFrame:
    """(doc_id, min_span): smallest window containing the query terms
    IN ORDER (Indri/INQUERY ordered window, #odN) — p1 < p2 < … < pm
    with slot i holding terms[i]; span = pm − p1 + 1. Repeated query
    terms are rejected (the greedy chain below assumes distinct
    slots). For the any-order variant see ``min_window_spans``.

    For a fixed start p1, greedily taking the SMALLEST admissible next
    position minimizes every later position and hence the span
    (exchange argument), so min_span = min over t1-occurrences of the
    greedy chain — computed entirely in Catalyst array HOFs over the
    per-slot position arrays (positions are sorted at build time): no
    explode, no window, no extra shuffle beyond the ≤|q|-term pivot.
    """
    folded = [t.lower() for t in terms]
    if not folded:
        raise ValueError("empty term list")
    if len(set(folded)) != len(folded):
        raise ValueError("ordered window requires distinct terms")
    p = pos_postings.filter(F.col("term").isin(folded))
    piv = p.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("positions"))).alias(f"a{i}")
            for i, t in enumerate(folded)
        ]
    )
    for i in range(len(folded)):
        piv = piv.filter(F.col(f"a{i}").isNotNull())

    def _after(c):
        # NB: must return a ONE-arg lambda — a second python parameter
        # (even a default) makes pyspark pass the array INDEX into it
        return lambda x: x > c

    def chain_span(start):
        cur = start
        for i in range(1, len(folded)):
            cur = F.array_min(F.filter(F.col(f"a{i}"), _after(cur)))
        return cur - start + 1  # null-propagates if any link missing

    spans = F.transform(F.col("a0"), lambda s: chain_span(s))
    return piv.select(
        "doc_id", F.array_min(spans).cast("long").alias("min_span")
    ).filter(F.col("min_span").isNotNull())


def ordered_window_search(
    pos_postings: DataFrame,
    terms: list[str],
    slop: int = 0,
    k: int = 20,
) -> DataFrame:
    """Top-k docs whose minimal ORDERED window is ≤ m + slop
    (slop=0 ⇔ exact-adjacency phrase match as a boolean), tightest
    first then doc_id asc."""
    if slop < 0:
        raise ValueError(f"slop must be ≥ 0, got {slop}")
    m = len(terms)
    return (
        ordered_window_spans(pos_postings, terms)
        .filter(F.col("min_span") <= m + slop)
        .orderBy(F.asc("min_span"), F.asc("doc_id"))
        .limit(k)
    )
