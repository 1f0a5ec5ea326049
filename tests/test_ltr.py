"""LTR feature extraction: every feature column recomputed brute-force
from the collected index."""

from __future__ import annotations

import math

import pytest

from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.ltr import ltr_features
from fulltextsearchengine_spark.operators.search import Searcher, normalize_query
from fulltextsearchengine_spark.sources.rawlog import TRANSCRIPT_SCHEMA

QUERIES = {"qa": ["ur", "lwcsf", "ZZZoov"], "qb": ["nz"], "qc": ["dhkewyg", "tsundvl"]}
K = 15
NOW = "2026-08-18 00:00:00"


@pytest.fixture(scope="module")
def searcher(spark, small_transcripts_pdf):
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    idx.postings = idx.postings.cache()
    idx.docs = idx.docs.cache()
    return Searcher(idx)


def test_ltr_features_match_brute(searcher):
    import datetime

    post = {}
    for r in searcher.index.postings.collect():
        post.setdefault(r["doc_id"], {})[r["term"]] = r["tf"]
    docs = {r["doc_id"]: r for r in searcher.index.docs.collect()}
    terms = {r["term"]: r["df"] for r in searcher.index.terms.collect()}
    n = searcher.stats["num_docs"]

    cands = searcher.bm25_search_batch(QUERIES, K).collect()
    now_epoch = datetime.datetime.strptime(NOW, "%Y-%m-%d %H:%M:%S").timestamp()

    expected = {}
    for c in cands:
        qid, d = c["query_id"], c["doc_id"]
        qts = sorted(set(normalize_query(QUERIES[qid])))
        matched = [t for t in qts if t in post[d]]
        tf_sum = sum(post[d][t] for t in matched)
        idf_sum = sum(math.log(n / terms[t]) for t in matched)
        ts = docs[d]["ts"]
        age = int((now_epoch - ts.timestamp()) // 86400) if ts is not None else -1
        expected[(qid, d)] = (
            round(c["score"] * 1e6),
            c["rank"],
            tf_sum,
            len(matched),
            round(len(matched) / len(qts) * 1e6),
            round(idf_sum * 1e6),
            docs[d]["doc_len"],
            docs[d]["turn_idx"],
            age,
        )

    got = {
        (r["query_id"], r["doc_id"]): (
            r["bm25_micro"],
            r["rank"],
            r["tf_sum"],
            r["matched"],
            r["coverage_micro"],
            r["idf_sum_micro"],
            r["doc_len"],
            r["turn_idx"],
            r["age_days"],
        )
        for r in ltr_features(searcher, QUERIES, k=K, now=NOW).collect()
    }
    assert got == expected
    assert len(got) >= 2 * K  # qa and qc should fill their pools
    # coverage must be fractional for the OOV-bearing query (|q|=3)
    assert any(0 < got[k][4] < 10**6 for k in got if k[0] == "qa")


def test_ltr_without_now(searcher):
    rows = ltr_features(searcher, {"q": ["ur"]}, k=5).collect()
    assert rows and all(r["age_days"] == -1 for r in rows)


def test_ltr_k_guard(searcher):
    with pytest.raises(ValueError):
        ltr_features(searcher, QUERIES, k=0)
