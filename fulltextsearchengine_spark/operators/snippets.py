"""Query-time snippet (hit-highlighting window) extraction for search
results.

The reference returns bare docIDs (ReviewSearch.java:95-103); a
transcript-search user needs to SEE why a turn matched. The index
stores no positions (SURVEY §2.4 — deliberate, §10.1), so snippets are
computed at query time from the source text of the ≤k winners — the
standard posture of postings-only engines (recompute-on-display beats
storing per-occurrence offsets at 10^12-turn scale, where positions
would multiply index size by the average tf).

Plan shape: BM25 top-k first (k rows on the driver-sized side), then
``broadcast(hits)`` joined back to docs for (conv_id, turn_idx) and to
the transcripts scan for text — two BroadcastHashJoins, so the
full-corpus side is touched by exactly one more scan and zero shuffles.
The snippet window is pure Catalyst string math (no UDF): first match
position of any query term over the lowercased text (earliest wins —
deterministic), ± ``width`` chars.

Matching is substring-level, not token-level (a query term may
highlight inside a longer word) — standard highlighter behavior, and
every top-k doc is guaranteed ≥1 match because candidates are the
OR-union of the query terms' postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import Searcher, normalize_query


def snippets_for_hits(
    hits: DataFrame,
    docs: DataFrame,
    transcripts: DataFrame,
    query: list[str],
    width: int = 30,
) -> DataFrame:
    """hits(doc_id, score) → (doc_id, score, conv_id, turn_idx, snippet).

    snippet = 2·width chars of text starting width chars before the
    earliest occurrence of any (sorted, folded) query term."""
    terms = sorted(set(normalize_query(query)))
    lowered = F.lower(F.col("text"))
    positions = F.array(*[F.locate(t, lowered) for t in terms])
    first_pos = F.array_min(F.filter(positions, lambda p: p > 0))
    start = F.greatest(F.lit(1), first_pos - F.lit(width))
    enriched = (
        F.broadcast(hits)
        .join(docs.select("doc_id", "conv_id", "turn_idx"), "doc_id")
        .join(transcripts.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
    )
    return enriched.select(
        "doc_id",
        "score",
        "conv_id",
        "turn_idx",
        F.when(first_pos.isNotNull(), F.substring(F.col("text"), start, 2 * width))
        .otherwise(F.lit(""))
        .alias("snippet"),
    )


def search_with_snippets(
    searcher: Searcher,
    transcripts: DataFrame,
    query: list[str],
    k: int = 10,
    width: int = 30,
) -> DataFrame:
    """BM25 top-k + snippets, ordered score desc / doc_id asc."""
    hits = searcher.bm25_search(query, k)
    return snippets_for_hits(
        hits, searcher.index.docs, transcripts, query, width
    ).orderBy(F.desc("score"), F.asc("doc_id"))
