"""Multi-term queries: wildcard / fuzzy / regex patterns expanded
against the dictionary, then scored as an ordinary OR-union BM25 query
— Lucene's MultiTermQuery with the SCORING_BOOLEAN rewrite (public
semantics: Lucene MultiTermQuery/RewriteMethod docs; the expansion cap
is Elasticsearch's ``max_expansions``, selection by collection
frequency is its ``top_terms_N`` convention).

The reference engine answers exact terms only (Dictionary.java:145-165
binary search; a pattern has no entry point). Here the dictionary IS a
table, so pattern matching is a vocabulary-sized problem, never a
postings-sized one:

  expand   pattern → ≤ max_expansions dictionary terms, ranked
           cf desc / term asc (the already-shipped lexicon lookups:
           pushed-filter prefix scan, pg_trgm trigram intersection for
           infix wildcards, FastSS deletion neighborhood for fuzzy,
           anchored regex over the terms scan)
  collect  the expansion list to the driver — ≤ max_expansions rows,
           the same driver-sized contract as Searcher.term_stats
  score    one standard BM25 OR-union over (expansions ∪ literal
           terms): each expanded term contributes with its OWN idf
           (scoring-boolean rewrite, not constant-score), so rare
           expansions rank above stopword-ish ones

Scale shape: the expensive side (postings) sees exactly one pruned
``In(term, …)`` scan with ≤ max_expansions + |literals| keys — the
same plan as any hand-written query of that many terms. The dictionary
side is vocabulary-sized and sidecar-prunable (lexicon.py layouts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lexicon import fuzzy_term_lookup, wildcard_term_lookup
from .search import Searcher

MAX_EXPANSIONS = 50


def regex_term_lookup(terms: DataFrame, pattern: str, k: int = 20) -> DataFrame:
    """Dictionary terms whose ENTIRE text matches ``pattern`` (Lucene
    RegexpQuery semantics: implicitly anchored), ranked cf desc / term
    asc. A vocabulary-sized scan — regex never touches postings."""
    anchored = f"^(?:{pattern})$"
    return (
        terms.filter(F.col("term").rlike(anchored))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(k)
        .select("term", "df", "cf")
    )


def expand_wildcard(
    searcher: Searcher,
    pattern: str,
    max_expansions: int = MAX_EXPANSIONS,
    trigram_index: DataFrame | None = None,
) -> list[str]:
    """Top-``max_expansions`` dictionary terms matching the ``*``
    pattern, cf desc / term asc — sorted for reproducible score sums."""
    rows = wildcard_term_lookup(
        searcher.index.terms, pattern, k=max_expansions, trigram_index=trigram_index
    ).collect()
    return sorted(r["term"] for r in rows)


def expand_fuzzy(
    searcher: Searcher,
    term: str,
    max_expansions: int = MAX_EXPANSIONS,
    fuzzy_index: DataFrame | None = None,
) -> list[str]:
    """Dictionary terms within edit distance 1 of ``term`` (FastSS
    deletion neighborhood — exact), top-``max_expansions`` by cf."""
    rows = fuzzy_term_lookup(
        searcher.index.terms, term, k=max_expansions, fuzzy_index=fuzzy_index
    ).collect()
    return sorted(r["term"] for r in rows)


def expand_regex(
    searcher: Searcher, pattern: str, max_expansions: int = MAX_EXPANSIONS
) -> list[str]:
    """Dictionary terms full-matching ``pattern``, top by cf."""
    rows = regex_term_lookup(searcher.index.terms, pattern, k=max_expansions).collect()
    return sorted(r["term"] for r in rows)


def _expanded_search(
    searcher: Searcher, expansions: list[str], literal_terms: list[str], k: int
) -> DataFrame:
    terms = sorted({*expansions, *(t.lower() for t in literal_terms)})
    if not terms:
        return Searcher.topk(searcher._empty_scores(), k)
    return searcher.bm25_search(terms, k)


def wildcard_search(
    searcher: Searcher,
    pattern: str,
    k: int = 10,
    max_expansions: int = MAX_EXPANSIONS,
    literal_terms: list[str] | None = None,
    trigram_index: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k where ``pattern`` rewrites to its dictionary
    expansions (∪ ``literal_terms``). Empty expansion = the clause
    matches nothing (Lucene MatchNoDocs), the literals still score."""
    exp = expand_wildcard(searcher, pattern, max_expansions, trigram_index)
    return _expanded_search(searcher, exp, literal_terms or [], k)


def fuzzy_search(
    searcher: Searcher,
    term: str,
    k: int = 10,
    max_expansions: int = MAX_EXPANSIONS,
    literal_terms: list[str] | None = None,
    fuzzy_index: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k where ``term`` rewrites to its edit-distance-1
    dictionary neighborhood (which includes the term itself when it is
    in-vocabulary)."""
    exp = expand_fuzzy(searcher, term, max_expansions, fuzzy_index)
    return _expanded_search(searcher, exp, literal_terms or [], k)


def regex_search(
    searcher: Searcher,
    pattern: str,
    k: int = 10,
    max_expansions: int = MAX_EXPANSIONS,
    literal_terms: list[str] | None = None,
) -> DataFrame:
    """BM25 top-k where ``pattern`` (full-match) rewrites to its
    dictionary expansions."""
    exp = expand_regex(searcher, pattern, max_expansions)
    return _expanded_search(searcher, exp, literal_terms or [], k)
