"""Edge cases: empty corpus (ReviewSearchTest.java:212-233 analog),
skew-boundedness of the block layout on a stopword-heavy corpus
(SURVEY.md §7.1 step 6), empty-text turns."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.posting_blocks import build_posting_blocks
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    idx = build_index(empty)
    assert idx.docs.count() == 0
    assert idx.postings.count() == 0
    st = idx.stats_row()
    assert st["num_docs"] == 0 and (st["total_tokens"] or 0) == 0
    s = Searcher(idx)
    assert s.bm25_search(["anything"], 5).count() == 0
    assert s.vector_space_search(["x"], 5).count() == 0
    assert s.language_model_search(["x"], 5).count() == 0
    assert s.conv_search(["x"], 5).count() == 0


def test_all_empty_texts(spark):
    rows = [(f"c{i}", 0, "user", "", None, "2026-01-01") for i in range(5)]
    idx = build_index(_df(spark, rows))
    assert idx.docs.count() == 5  # empty turns are still docs (doc_len 0)
    assert {r["doc_len"] for r in idx.docs.collect()} == {0}
    assert idx.postings.count() == 0
    assert Searcher(idx).bm25_search(["x"], 3).count() == 0


def test_stopword_skew_bounded_blocks(spark):
    """Every doc contains the stopword 'the' → its posting list spans the
    whole corpus. The (term, bucket) build must bound every applyInPandas
    group by bucket_range, and the hot term's blocks must spread across
    buckets rather than landing in one task."""
    n = 400
    rng = np.random.default_rng(3)
    rows = [
        (
            f"c{i//4:04d}", i % 4, "user",
            "the " + " ".join(rng.choice(["alpha", "beta", "gamma"], size=3)),
            None, "2026-01-01",
        )
        for i in range(n)
    ]
    idx = build_index(_df(spark, rows))
    bucket_range = 64
    blocks = build_posting_blocks(
        idx.postings, avgdl=4.0, block_size=16, bucket_range=bucket_range
    )
    hot = [r for r in blocks.collect() if r["term"] == "the"]
    buckets = {r["bucket"] for r in hot}
    assert len(buckets) == -(-n // bucket_range)  # spread over all doc-range buckets
    per_bucket = {}
    for r in hot:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n"]
    assert all(v <= bucket_range for v in per_bucket.values())  # bounded task work
    assert sum(per_bucket.values()) == n  # df('the') == every doc


def test_duplicate_turn_key_docids_deterministic(spark):
    """(conv_id, turn_idx) is the sort key; identical corpus shuffled
    differently must yield identical postings."""
    rng = np.random.default_rng(5)
    rows = [
        (f"c{i%7}", i // 7, "user", f"tok{rng.integers(0, 9)} shared", None, "2026-01-01")
        for i in range(70)
    ]
    a = build_index(_df(spark, rows))
    b = build_index(_df(spark, list(reversed(rows))))
    pa = sorted((r["term"], r["doc_id"], r["tf"]) for r in a.postings.collect())
    pb = sorted((r["term"], r["doc_id"], r["tf"]) for r in b.postings.collect())
    assert pa == pb
