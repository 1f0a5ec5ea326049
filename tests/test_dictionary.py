"""Front-coded dictionary segments: round-trip + two-level lookup vs the
plain terms table (Dictionary.java analog — SURVEY.md §2.8 C4/C5)."""

from __future__ import annotations

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.dictionary import DictionaryReader, build_dictionary_segments
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def dict_ctx(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    segments = build_dictionary_segments(idx.terms, seg_size=64).cache()
    return golden, segments


def test_segments_sorted_and_disjoint(dict_ctx):
    _, segments = dict_ctx
    rows = sorted(segments.collect(), key=lambda r: r["first_term"])
    for r in rows:
        assert r["first_term"] <= r["last_term"]
        assert r["n_terms"] == len(r["suffix_lens"]) == len(r["dfs"]) == len(r["cfs"])
    for a, b in zip(rows, rows[1:]):
        assert a["last_term"] < b["first_term"]


def test_roundtrip_all_terms(dict_ctx):
    golden, segments = dict_ctx
    reader = DictionaryReader(segments)
    assert reader.all_terms() == sorted(golden["term_to_document_frequency"])


def test_lookup_every_term_and_oov(dict_ctx):
    golden, segments = dict_ctx
    reader = DictionaryReader(segments)
    for t, df in golden["term_to_document_frequency"].items():
        got = reader.lookup(t)
        assert got == (df, golden["term_to_collection_frequency"][t]), t
    assert reader.lookup("zzznotaword") is None
    assert reader.lookup("") is None
    assert reader.lookup("\x00") is None
    # case folding at lookup (IndexReader.java:93)
    some = next(iter(golden["term_to_document_frequency"]))
    assert reader.lookup(some.upper()) == reader.lookup(some)
