"""Dictionary-surface lookups beyond exact terms: prefix search and
fuzzy (edit-distance-1) term lookup.

The reference dictionary answers only exact lookups (binary search,
dictionary/Dictionary.java:145-165); its sorted blocked layout is
however exactly what prefix search wants, and a production engine over
noisy transcript text needs typo-tolerant term resolution before any
scorer can run. Both are dictionary-level operations — they read the
tiny-relative-to-postings ``terms`` table, never postings.

- ``prefix_search``: ``StartsWith`` is a pushed parquet filter on the
  sorted terms table (min/max row-group pruning — the Spark analog of
  the reference's blocked binary search), then top-k by collection
  frequency. No shuffle beyond the k-row TakeOrdered.
- ``fuzzy_term_lookup``: FastSS / SymSpell-style deletion-neighborhood
  matching (public algorithm: Bocek et al., "Fast Similarity Search in
  Large Dictionaries", 2007): two strings are within edit distance 1
  iff their 1-deletion neighborhoods (word included) intersect. The
  dictionary side explodes to a ``(variant, term)`` table — built on
  the fly for ad-hoc queries or persisted once via
  ``build_fuzzy_index`` (sorted by variant ⇒ pushed ``In`` filter per
  query, the same pruned-scan shape as posting lookup); the query side
  is a driver-computed variant list (|q|+1 strings). Candidates are
  verified with ``levenshtein`` to kill neighborhood false positives
  (e.g. "ab"/"ba" share variants at distance 2), so results are exact.

Scale: the fuzzy sidecar is Σ(len+1) rows over the vocabulary — ~11×
the terms table, still millions-of-rows tiny next to postings, and the
per-query scan prunes to ≤|q|+1 variant keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 1-deletion neighborhood of `term`, term itself included (FastSS).
_VARIANTS_EXPR = (
    "array_union(array(term), transform(sequence(1, length(term)), "
    "i -> concat(substring(term, 1, i-1), substring(term, i+1, length(term)-i))))"
)


def prefix_search(terms: DataFrame, prefix: str, k: int = 20) -> DataFrame:
    """Top-k dictionary terms with ``prefix``, by cf desc then term asc
    (autocomplete order). Plan: pushed StartsWith on the sorted terms
    table + TakeOrderedAndProject."""
    return (
        terms.filter(F.col("term").startswith(prefix.lower()))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(k)
        .select("term", "df", "cf")
    )


def deletion_variants(q: str) -> list[str]:
    """Driver-side 1-deletion neighborhood of a query term (folded)."""
    q = q.lower()
    return sorted({q, *(q[:i] + q[i + 1 :] for i in range(len(q)))})


def build_fuzzy_index(terms: DataFrame) -> DataFrame:
    """Persistable ``(variant, term, df, cf)`` sidecar: the exploded
    1-deletion neighborhood of the vocabulary. Write sorted by variant
    (``sortWithinPartitions`` after a range exchange) so per-query
    variant lookups prune row groups, like posting lookups do."""
    return (
        terms.withColumn("variant", F.explode(F.expr(_VARIANTS_EXPR)))
        .select("variant", "term", "df", "cf")
    )


def save_fuzzy_index(
    fuzzy: DataFrame, path: str, num_partitions: int | None = None
) -> None:
    """Persist the deletion-variant sidecar sorted by variant (range
    exchange + in-partition sort) so each query's ≤|q|+1 variant keys
    prune to a handful of parquet row groups — the same pruned-scan
    shape as posting lookup. zstd like every index artifact."""
    from .index_build import PARQUET_CODEC

    spark = fuzzy.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    (
        fuzzy.repartitionByRange(n, "variant", "term")
        .sortWithinPartitions("variant", "term")
        .write.mode("overwrite")
        .option("compression", PARQUET_CODEC)
        .parquet(path)
    )


def fuzzy_term_lookup(
    terms: DataFrame,
    query_term: str,
    k: int = 20,
    max_edits: int = 1,
    fuzzy_index: DataFrame | None = None,
) -> DataFrame:
    """Dictionary terms within ``max_edits`` (=1) of ``query_term``,
    ranked cf desc / term asc — exact results (candidate generation via
    deletion neighborhoods, verification via ``levenshtein``).

    ``max_edits`` must be 1: the 1-deletion neighborhood intersection is
    complete only for edit distance ≤ 1 (FastSS); rather than silently
    losing recall at 2 (cf. the SimHash banding guard, dedup.py), we
    raise. Distance-2 support = 2-deletion neighborhoods, a ~L²/2-per-
    term sidecar — out of scope until a consumer needs it.
    """
    if max_edits != 1:
        raise ValueError(
            f"fuzzy_term_lookup is exact only for max_edits=1 (got {max_edits}); "
            "deletion neighborhoods lose recall beyond that"
        )
    q = query_term.lower()
    qvars = deletion_variants(q)
    side = fuzzy_index if fuzzy_index is not None else build_fuzzy_index(terms)
    return (
        side.filter(F.col("variant").isin(qvars))
        .select("term", "df", "cf")
        .distinct()
        .filter(F.levenshtein(F.col("term"), F.lit(q)) <= max_edits)
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(k)
    )


# ---------------------------------------------------------------- wildcard

# all length-3 substrings of `term` (pg_trgm-style, unpadded: infix
# patterns can't use boundary trigrams anyway)
_TRIGRAMS_EXPR = (
    "array_distinct(transform(sequence(1, greatest(length(term) - 2, 0)), "
    "i -> substring(term, i, 3)))"
)


def build_trigram_index(terms: DataFrame) -> DataFrame:
    """Persistable ``(trigram, term, df, cf)`` sidecar over the
    VOCABULARY (pg_trgm's public design): ~(len−2)× the terms table —
    dictionary-sized, tiny next to postings. Write sorted by trigram
    (save_fuzzy_index's layout contract) so each query's trigram keys
    prune to a handful of row groups."""
    return (
        terms.withColumn("trigram", F.explode(F.expr(_TRIGRAMS_EXPR)))
        .select("trigram", "term", "df", "cf")
    )


def _wildcard_to_like(pattern: str) -> str:
    """``*``-wildcard pattern → SQL LIKE (escape LIKE's own wildcards)."""
    out = []
    for ch in pattern.lower():
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def wildcard_term_lookup(
    terms: DataFrame,
    pattern: str,
    k: int = 20,
    trigram_index: DataFrame | None = None,
) -> DataFrame:
    """Dictionary terms matching a ``*``-wildcard ``pattern`` (e.g.
    ``*tab*``, ``ta*le``, ``*ble``), ranked cf desc / term asc — exact.

    Candidate generation: terms containing ALL trigrams of the pattern's
    literal segments (a term matching the pattern necessarily contains
    every such trigram, so the trigram intersection is recall-complete);
    verification: SQL LIKE kills false positives (trigrams present but
    in the wrong order/overlap). With no segment ≥3 chars there are no
    trigrams to prune on and the lookup falls back to a LIKE scan of the
    dictionary — still vocabulary-sized, never postings-sized.
    """
    like = _wildcard_to_like(pattern)
    segs = [s for s in pattern.lower().split("*") if s]
    qtris = sorted({s[i : i + 3] for s in segs for i in range(len(s) - 2)})
    if qtris:
        side = (
            trigram_index
            if trigram_index is not None
            else build_trigram_index(terms)
        )
        cand = (
            side.filter(F.col("trigram").isin(qtris))
            .groupBy("term", "df", "cf")
            .agg(F.count(F.lit(1)).alias("n_hit"))
            .filter(F.col("n_hit") == len(qtris))
            .select("term", "df", "cf")
        )
    else:
        cand = terms.select("term", "df", "cf")
    return (
        cand.filter(F.col("term").like(like))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(k)
    )
