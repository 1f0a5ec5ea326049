"""Graded ranking metrics: NDCG/MRR/P@k/recall@k must match a pure-
python recomputation over the engine's own ranks + brute-force qrels."""

from __future__ import annotations

import math

import pytest

from fulltextsearchengine_spark.operators.evaluation import (
    graded_eval,
    qrels_from_corpus,
)
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.search import Searcher, normalize_query
from fulltextsearchengine_spark.sources.rawlog import TRANSCRIPT_SCHEMA

QUERIES = {
    # hot corpus terms that genuinely co-occur (grades reach 3)
    "q_mixed": ["ur", "lwcsf", "dhkewyg"],
    "q_two": ["nz", "tsundvl"],
    "q_oov": ["zzzznotaterm"],
}
K = 10


@pytest.fixture(scope="module")
def searcher(spark, small_transcripts_pdf):
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    idx.postings = idx.postings.cache()
    idx.docs = idx.docs.cache()
    return Searcher(idx)


def _brute_qrels(searcher) -> dict[tuple[str, int], int]:
    by_doc: dict[int, set[str]] = {}
    for r in searcher.index.postings.select("doc_id", "term").collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["term"])
    out = {}
    for qid, ts in QUERIES.items():
        qset = set(normalize_query(ts))
        for d, terms in by_doc.items():
            g = min(3, len(qset & terms))
            if g > 0:
                out[(qid, d)] = g
    return out


def test_qrels_match_brute(searcher):
    brute = _brute_qrels(searcher)
    got = {
        (r["query_id"], r["doc_id"]): r["grade"]
        for r in qrels_from_corpus(searcher, QUERIES).collect()
    }
    assert got == brute


def test_graded_eval_matches_brute(searcher):
    brute_qrels = _brute_qrels(searcher)
    ranks = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in searcher.bm25_search_batch(QUERIES, K).collect()
    }
    expected = {}
    for qid in QUERIES:
        graded = [
            (rk, brute_qrels.get((qid, ranks[(qid, rk)]), 0))
            for rk in range(1, K + 1)
            if (qid, rk) in ranks
        ]
        dcg = sum((2**g - 1) / math.log2(rk + 1) for rk, g in graded)
        rel = sorted(
            (g for (q, _), g in brute_qrels.items() if q == qid), reverse=True
        )
        idcg = sum((2**g - 1) / math.log2(i + 2) for i, g in enumerate(rel[:K]))
        hits = sum(1 for _, g in graded if g > 0)
        first = next((rk for rk, g in graded if g > 0), None)
        n_rel = len(rel)
        expected[qid] = (
            round(dcg / idcg * 1e6) if idcg > 0 else 0,
            round(1e6 / first) if first else 0,
            round(hits / K * 1e6),
            round(hits / n_rel * 1e6) if n_rel else 0,
        )
    got = {
        r["query_id"]: (
            r["ndcg_micro"],
            r["rr_micro"],
            r["precision_micro"],
            r["recall_micro"],
        )
        for r in graded_eval(searcher, QUERIES, k=K).collect()
    }
    assert got == expected
    # the OOV query must be present with all-zero metrics, not dropped
    assert got["q_oov"] == (0, 0, 0, 0)
    # the mixed query must actually exercise graded gains (some grade ≥ 2)
    assert any(g >= 2 for (q, _), g in _brute_qrels(searcher).items() if q == "q_mixed")
    assert 0 < got["q_mixed"][0] <= 10**6


def test_k_guard(searcher):
    with pytest.raises(ValueError):
        graded_eval(searcher, QUERIES, k=0)
