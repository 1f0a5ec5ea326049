"""Recency-boosted ranking: exponential time-decay on BM25 (the public
Elasticsearch `function_score` exp-decay / half-life pattern).

Transcripts carry ``ts`` per turn — the one metadata axis the
reference's review corpus never exploits in ranking. The decayed score
is

    score(d) = bm25(d) · 2^(−age_days(d) / half_life_days)
    age_days(d) = (now − ts_d) / 86400        (clamped at ≥ 0)

``now`` is an explicit parameter, never wall-clock: serving passes its
request time, gates/tests pass a fixed literal, so results are
reproducible (and the DuckDB twin computes the identical expression).
Docs with NULL ts keep their undecayed BM25 (decay factor 1) — absent
metadata shouldn't silently bury a document.

Plan shape: the candidate-sized BM25 score frame joins docs on doc_id
for ts (one keyed join — candidates ⊆ docs, Spark broadcasts the
smaller side), then one scalar expression and the usual
TakeOrderedAndProject. The decay multiplies AFTER aggregation, so the
per-term pruned-pivot plan of bm25_scores is untouched.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import Searcher

DEFAULT_HALF_LIFE_DAYS = 30.0


def recency_boosted_scores(
    searcher: Searcher,
    query: list[str] | None = None,
    now: str | None = None,
    half_life_days: float = DEFAULT_HALF_LIFE_DAYS,
    scores: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, score): BM25 × 2^(−age/half_life). ``now`` is an ISO
    timestamp string ('YYYY-MM-DD HH:MM:SS'). ``scores``: optional
    pre-scored (doc_id, score) frame to decay instead of plain BM25 —
    any scorer composes (msm, boolean, filtered); exactly one of
    ``query``/``scores``."""
    if half_life_days <= 0:
        raise ValueError(f"half_life_days must be > 0, got {half_life_days}")
    if now is None:
        raise ValueError("now= is required (an ISO timestamp string)")
    if (query is None) == (scores is None):
        raise ValueError("pass exactly one of query= or scores=")
    base = scores if scores is not None else searcher.bm25_scores(query)
    ts = searcher.index.docs.select("doc_id", "ts")
    age_days = (
        F.unix_timestamp(F.lit(now)) - F.unix_timestamp(F.col("ts"))
    ).cast("double") / F.lit(86400.0)
    decay = F.pow(
        F.lit(2.0), -F.greatest(age_days, F.lit(0.0)) / F.lit(half_life_days)
    )
    return base.join(ts, "doc_id").select(
        "doc_id",
        (F.col("score") * F.coalesce(decay, F.lit(1.0))).alias("score"),
    )


def recency_boosted_search(
    searcher: Searcher,
    query: list[str],
    now: str,
    k: int = 10,
    half_life_days: float = DEFAULT_HALF_LIFE_DAYS,
) -> DataFrame:
    """Top-k (score desc, doc_id asc) under time-decayed BM25."""
    return (
        recency_boosted_scores(searcher, query, now, half_life_days)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
