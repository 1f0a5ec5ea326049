"""Reference-shaped facade (api.py) end-to-end vs the oracle — the
IndexWriter/IndexReader/ReviewSearch call-shape parity check."""

from __future__ import annotations

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.api import IndexReader, IndexWriter, ReviewSearch
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def api_ctx(spark, tiny_transcripts_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("apiidx"))
    sdf = spark.createDataFrame(tiny_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    IndexWriter(spark).write(sdf, d)
    reader = IndexReader(spark, d)
    golden = oracle.build_index(tiny_transcripts_pdf)
    return reader, ReviewSearch(reader), golden


def test_reader_getters(api_ctx):
    reader, _, golden = api_ctx
    assert reader.get_number_of_reviews() == golden["num_docs"]
    assert reader.get_token_size_of_reviews() == golden["total_tokens"]
    for t in list(golden["term_to_document_frequency"])[:20]:
        assert reader.get_token_frequency(t) == golden["term_to_document_frequency"][t]
        assert reader.get_token_collection_frequency(t) == golden["term_to_collection_frequency"][t]
        flat = golden["term_to_postings"][t]
        assert list(reader.get_reviews_with_token(t)) == list(zip(flat[0::2], flat[1::2]))
    assert reader.get_token_frequency("zzznotaword") == 0
    assert list(reader.get_reviews_with_token("zzznotaword")) == []


def test_reader_metadata(api_ctx):
    reader, _, golden = api_ctx
    some = sorted(golden["doc_to_meta"])[:5]
    for d in some:
        assert reader.get_review_length(d) == golden["doc_to_length"][d]
        assert reader.get_conv_id(d) == golden["doc_to_meta"][d]["conv_id"]
    assert reader.get_review_length(10 ** 9) == -1
    cid = golden["doc_to_meta"][some[0]]["conv_id"]
    assert reader.get_product_reviews(cid) == golden["conv_to_doc_ids"][cid]
    assert reader.get_product_reviews("conv_zzz") == []


def test_searches(api_ctx):
    _, search, golden = api_ctx
    q = list(golden["term_to_document_frequency"])[:3]
    exp = oracle.vector_space_search(golden, q, 5)
    got = search.vector_space_search(q, 5)
    assert [g[0] for g in got] == [e[0] for e in exp]
    exp = oracle.language_model_search(golden, q, 5, lam=0.5)
    got = search.language_model_search(q, 0.5, 5)
    assert [g[0] for g in got] == [e[0] for e in exp]
    exp = oracle.bm25_search(golden, q, 5)
    got = search.bm25_search(q, 5)
    assert [g[0] for g in got] == [e[0] for e in exp]
    exp_conv = [c for c, _, _ in oracle.conv_search(golden, q, 5)]
    assert search.product_search(q, 5) == exp_conv
