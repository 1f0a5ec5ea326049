"""Golden-file gate (FIXTURES.md §2-§3): the committed JSON goldens —
regenerated only by scripts/make_goldens.py — must match the live
oracle (drift guard) AND the Spark engine end-to-end on the tiny
corpus. This is the direct analog of the reference's
IndexReaderIntegrationTest against datasets/100.json."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from fulltextsearchengine_spark import datagen, oracle
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

GOLDENS = Path(__file__).parent / "goldens"


@pytest.fixture(scope="module")
def tiny_golden():
    return json.loads((GOLDENS / "expected_tiny.json").read_text())


@pytest.fixture(scope="module")
def tiny_queries_golden():
    return json.loads((GOLDENS / "expected_queries_tiny.json").read_text())


def test_oracle_matches_committed_golden(tiny_golden, tiny_transcripts_pdf):
    idx = oracle.build_index(tiny_transcripts_pdf)
    assert idx["total_tokens"] == tiny_golden["total_tokens"]
    assert idx["unique_tokens"] == tiny_golden["unique_tokens"]
    assert idx["term_to_postings"] == tiny_golden["term_to_postings"]
    assert {str(k): v for k, v in idx["doc_to_length"].items()} == tiny_golden["doc_to_length"]


def test_engine_matches_committed_query_golden(spark, tiny_transcripts_pdf, tiny_queries_golden):
    sdf = spark.createDataFrame(tiny_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    searcher = Searcher(build_index(sdf))
    for entry in tiny_queries_golden["queries"][:12]:
        q, k = entry["q"], entry["k"]
        got = [(r["doc_id"], r["score"]) for r in searcher.bm25_search(q, k).collect()]
        assert [g[0] for g in got] == [e[0] for e in entry["bm25"]], q
        for (gd, gs), (ed, es) in zip(got, entry["bm25"]):
            assert gs == pytest.approx(es, rel=1e-9, abs=1e-300)
        got = [(r["doc_id"], r["score"]) for r in searcher.vector_space_search(q, k).collect()]
        assert [g[0] for g in got] == [e[0] for e in entry["lnn_ltc"]], q
