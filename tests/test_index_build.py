"""Spark index build vs the pure-pandas oracle (FIXTURES.md §2 golden
contents) — the analog of the reference's golden-file integration tests
(src/test/java/webdata/IndexReaderIntegrationTest.java:51-188, golden
JSON from datasets/testScenarioBuilder.py)."""

from __future__ import annotations

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module", params=["builtin", "pandas_udf"])
def built(request, spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf, use_pandas_tokenizer=(request.param == "pandas_udf"))
    return golden, idx


def test_doc_ids_and_metadata(built):
    golden, idx = built
    rows = idx.docs.collect()
    assert len(rows) == golden["num_docs"]
    for r in rows:
        meta = golden["doc_to_meta"][r["doc_id"]]
        assert (r["conv_id"], r["turn_idx"], r["role"]) == (
            meta["conv_id"], meta["turn_idx"], meta["role"]
        )
        assert (r["tool"] or None) == meta["tool"]
        assert r["doc_len"] == golden["doc_to_length"][r["doc_id"]]


def test_doc_ids_order_invariant(spark, small_transcripts_pdf):
    """Shuffled input rows must produce identical docIDs (per-row
    invariant from input_hint: text equality under stable turn order)."""
    from fulltextsearchengine_spark.operators.docid import assign_doc_ids

    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    shuffled = spark.createDataFrame(
        small_transcripts_pdf.sample(frac=1.0, random_state=99).reset_index(drop=True),
        schema=TRANSCRIPT_SCHEMA,
    )
    a = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in assign_doc_ids(sdf).collect()}
    b = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in assign_doc_ids(shuffled).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, len(a) + 1))


def test_postings(built):
    golden, idx = built
    got: dict[str, list[int]] = {}
    for r in sorted(idx.postings.collect(), key=lambda r: (r["term"], r["doc_id"])):
        got.setdefault(r["term"], []).extend([r["doc_id"], r["tf"]])
        assert r["doc_len"] == golden["doc_to_length"][r["doc_id"]]
    assert got == golden["term_to_postings"]


def test_terms_df_cf(built):
    golden, idx = built
    rows = idx.terms.collect()
    assert {r["term"]: r["df"] for r in rows} == golden["term_to_document_frequency"]
    assert {r["term"]: r["cf"] for r in rows} == golden["term_to_collection_frequency"]


def test_conv_ranges_contiguous(built):
    golden, idx = built
    for r in idx.conv_ranges.collect():
        ids = golden["conv_to_doc_ids"][r["conv_id"]]
        assert r["from_doc_id"] == ids[0]
        assert r["to_doc_id"] == ids[-1]
        assert r["n_docs"] == len(ids)
        assert ids == list(range(ids[0], ids[-1] + 1))  # contiguity


def test_global_stats(built):
    golden, idx = built
    s = idx.stats_row()
    assert s["total_tokens"] == golden["total_tokens"]
    assert s["unique_terms"] == golden["unique_tokens"]
    assert s["num_docs"] == golden["num_docs"]
    assert s["num_pairs"] == sum(golden["term_to_document_frequency"].values())


def test_overlapped_writes_parity(spark, tiny_transcripts_pdf, tmp_path, monkeypatch):
    """Concurrent derivation writes (docs ∥ terms, conv_ranges ∥ stats —
    the Amdahl serial-tail fix) produce tables identical to the
    sequential path."""
    from fulltextsearchengine_spark.operators import index_build

    sdf = spark.createDataFrame(tiny_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    monkeypatch.setattr(index_build, "OVERLAP_WRITES", False)
    a = index_build.build_and_save_index(sdf, str(tmp_path / "seq"))
    monkeypatch.setattr(index_build, "OVERLAP_WRITES", True)
    b = index_build.build_and_save_index(sdf, str(tmp_path / "ovl"))
    for tbl in ("postings", "terms", "docs", "conv_ranges", "stats"):
        x, y = getattr(a, tbl), getattr(b, tbl)
        assert x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0, tbl


def test_map_side_invert_parity(spark, tiny_transcripts_pdf, tmp_path):
    """The single-shuffle Arrow-invert variant produces byte-identical
    tables to the explode+groupBy default (see build_and_save_index
    docstring — kept as a documented negative perf result)."""
    from fulltextsearchengine_spark.operators.index_build import build_and_save_index

    sdf = spark.createDataFrame(tiny_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    a = build_and_save_index(sdf, str(tmp_path / "a"))
    b = build_and_save_index(sdf, str(tmp_path / "b"), map_side_invert=True)
    for tbl in ("postings", "terms", "docs", "conv_ranges", "stats"):
        x, y = getattr(a, tbl), getattr(b, tbl)
        assert x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0, tbl
