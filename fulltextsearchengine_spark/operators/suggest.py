"""Context-aware query completion: rank prefix completions by how
often they co-occur with the words already typed — the corpus-derived
analog of Elasticsearch's context suggester (public API surface; the
ranking is plain doc-level co-occurrence, no learned model).

``prefix_search`` (lexicon.py) answers "most frequent term starting
with s-"; a search box that has already seen ``join`` should instead
answer "of the s- terms, which appear in documents ABOUT join" —
completion conditioned on context:

    candidates  dictionary terms with the prefix (vocabulary-sized,
                pushed StartsWith — never postings)
    context     the typed terms' posting doc_ids (pruned In scan)
    rank        co_docs = |docs(candidate) ∩ docs(context)| desc,
                then cf desc (corpus-frequency fallback), term asc

Scale shape: the candidate postings scan carries a pushed prefix range
filter (term >= 's' AND term < 't' — row-group-prunable on the sorted
layout); the context side is an ordinary pruned In(term,…) scan. One
doc_id-keyed semi-join + one keyed agg over candidate postings only.
The reference has no suggestion surface (Dictionary.java answers exact
lookups); this composes its tables the way its UI would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index_build import InvertedIndex


def suggest_next_terms(
    index: InvertedIndex,
    context_terms: list[str],
    prefix: str,
    k: int = 10,
) -> DataFrame:
    """(term, co_docs, cf) top-k completions of ``prefix`` ranked by
    co-occurrence with ``context_terms`` (docs containing ANY context
    term), cf desc / term asc tie-break. Context terms themselves are
    never suggested. Empty context degrades to prefix_search order
    (co_docs = 0 for nobody — pure cf ranking)."""
    pref = prefix.lower()
    if not pref:
        raise ValueError("prefix must be non-empty")
    ctx = sorted({t.lower() for t in context_terms})
    cand_terms = index.terms.filter(
        F.col("term").startswith(pref) & ~F.col("term").isin(ctx)
    ).select("term", "cf")
    cand_postings = index.postings.filter(
        F.col("term").startswith(pref) & ~F.col("term").isin(ctx)
    ).select("term", "doc_id")
    if ctx:
        ctx_docs = index.postings.filter(F.col("term").isin(ctx)).select("doc_id")
        hits = cand_postings.join(ctx_docs.distinct(), "doc_id", "left_semi")
    else:
        hits = cand_postings.limit(0)
    co = hits.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("co_docs"))
    return (
        cand_terms.join(co, "term", "left")
        .select(
            "term",
            F.coalesce(F.col("co_docs"), F.lit(0).cast("long")).alias("co_docs"),
            "cf",
        )
        .orderBy(F.desc("co_docs"), F.desc("cf"), F.asc("term"))
        .limit(k)
    )
