"""Percolation — reverse search: match STORED queries against documents
(the Elasticsearch percolate / Lucene MemoryIndex pattern, inverted for
Spark's batch/stream model).

Forward search asks "which docs match this query?"; percolation asks
"which of my registered queries does this doc match?" — the alerting /
saved-search / routing primitive every search deployment grows
(Elasticsearch `percolate` query; the reference has no analog — its
surface is forward-only, ReviewSearch.java).

Stored queries are CONFIG, not data (the synonyms.py contract): a
registry of (query_id, terms, role filter, min_should_match) entries,
driver-resident and broadcast. Semantics per query:

  matched(doc)  ⇔  |distinct query terms present in doc| ≥ msm
                   AND (role is NULL or doc.role = role)

msm defaults to ALL terms (pure conjunctive AND); msm=1 is OR; values
between give Elasticsearch's minimum_should_match.

100-TB plan shape: ONE pruned postings scan (In-filter over the union
of all registered terms — registry-sized, pushed to parquet row-group
min/max), broadcast-joined to the exploded (qid, term) frame, partial
agg on (qid, doc_id) combining map-side, then a registry-vs-docs role
check against the docs table. No corpus-sized shuffle: output is
match-sized. The streaming form (`percolate_turns`) runs the same
matcher on raw turns inside each micro-batch — matching is per-doc, so
no cross-batch state is needed (contrast stream_dedup.py, where the
operator IS the cross-batch state).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from .index_build import InvertedIndex
from .search import normalize_query


@dataclass(frozen=True)
class StoredQuery:
    """One registry entry. ``min_should_match=None`` → all terms."""

    query_id: str
    terms: tuple[str, ...]
    role: str | None = None
    min_should_match: int | None = None

    def __post_init__(self):
        norm = tuple(sorted(set(normalize_query(list(self.terms)))))
        object.__setattr__(self, "terms", norm)
        if not norm:
            raise ValueError(f"stored query {self.query_id!r} has no terms")
        msm = self.min_should_match
        if msm is not None and not 1 <= msm <= len(norm):
            raise ValueError(
                f"min_should_match {msm} out of [1, {len(norm)}] for {self.query_id!r}"
            )

    @property
    def required(self) -> int:
        return self.min_should_match or len(self.terms)


def _query_frame(spark, queries: list[StoredQuery]) -> DataFrame:
    ids = [q.query_id for q in queries]
    if len(set(ids)) != len(ids):
        raise ValueError("duplicate query_id in registry")
    rows = [
        (q.query_id, t, q.role, q.required)
        for q in queries
        for t in q.terms
    ]
    return spark.createDataFrame(
        rows, "query_id string, term string, role string, required int"
    )


def _match(term_rows: DataFrame, roles: DataFrame, queries: list[StoredQuery]) -> DataFrame:
    """Core matcher over (doc_id, term) rows + (doc_id, role)."""
    spark = term_rows.sparkSession
    qdf = _query_frame(spark, queries)
    all_terms = sorted({t for q in queries for t in q.terms})
    hits = (
        term_rows.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qdf.select("query_id", "term", "required")), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.countDistinct("term").alias("matched"),
            F.first("required").alias("required"),
        )
        .filter(F.col("matched") >= F.col("required"))
    )
    role_of = F.broadcast(
        qdf.select("query_id", F.col("role").alias("q_role")).distinct()
    )
    return (
        hits.join(roles, "doc_id")
        .join(role_of, "query_id")
        .filter(F.col("q_role").isNull() | (F.col("q_role") == F.col("role")))
        .select("query_id", "doc_id", "matched")
    )


def percolate_index(index: InvertedIndex, queries: list[StoredQuery]) -> DataFrame:
    """(query_id, doc_id, matched): registry matches over the standing
    index — the batch backfill ("which existing docs would have fired
    this alert?")."""
    return _match(
        index.postings.select("doc_id", "term"),
        index.docs.select("doc_id", "role"),
        queries,
    )


def percolate_turns(turns: DataFrame, queries: list[StoredQuery]) -> DataFrame:
    """(query_id, conv_id, turn_idx, matched): registry matches over raw
    transcript turns — no index required, so it runs identically on a
    static frame or inside each streaming micro-batch (append-safe:
    stateless per turn)."""
    toks = turns.select(
        "conv_id", "turn_idx", "role", tokens_col(F.col("text")).alias("tokens")
    )
    term_rows = toks.select(
        F.struct("conv_id", "turn_idx").alias("doc_id"),
        F.explode(F.array_distinct("tokens")).alias("term"),
    )
    roles = toks.select(F.struct("conv_id", "turn_idx").alias("doc_id"), "role")
    out = _match(term_rows, roles, queries)
    return out.select(
        "query_id",
        F.col("doc_id.conv_id").alias("conv_id"),
        F.col("doc_id.turn_idx").alias("turn_idx"),
        "matched",
    )
