"""match_counts, weighted hybrid fusion, corpus drift, key dedup, and
projected two-stage ANN vs brute-force Python reimplementations."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.dedup import keep_best_per_key
from fulltextsearchengine_spark.operators.drift import corpus_drift_report
from fulltextsearchengine_spark.operators.hybrid import (
    hybrid_weighted_search,
    minmax_normalize,
)
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.projection import (
    projected_cosine_topk,
    projection_matrix,
)
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

Q = ["aa", "ahc", "auir", "zzznotaword"]


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    return golden, Searcher(build_index(sdf))


# ---------------------------------------------------------------- count API


def test_match_counts_matches_brute(setup):
    golden, searcher = setup
    terms = sorted(
        t for t in set(x.lower() for x in Q) if oracle._postings_map(golden, t)
    )
    per_doc = Counter()
    for t in terms:
        for d in oracle._postings_map(golden, t):
            per_doc[d] += 1
    want = {
        m: sum(1 for c in per_doc.values() if c >= m)
        for m in range(1, len(terms) + 1)
    }
    got = {
        r["min_should_match"]: r["n_hits"]
        for r in setup[1].match_counts(Q).collect()
    }
    assert got == want
    assert len(got) == len(terms)  # the OOV term never becomes an m level


def test_match_counts_oov_only(setup):
    _, searcher = setup
    assert searcher.match_counts(["zzznotaword"]).collect() == []


def test_match_counts_consistent_with_msm_search(setup):
    _, searcher = setup
    counts = {
        r["min_should_match"]: r["n_hits"]
        for r in searcher.match_counts(Q).collect()
    }
    for m, n in counts.items():
        assert searcher.bm25_scores_msm(Q, m).count() == n


# ---------------------------------------------------------------- hybrid v2


def test_minmax_normalize(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 6.0), (3, 4.0)], "id long, score double"
    )
    got = {r["id"]: r["nscore"] for r in minmax_normalize(df, "score", "id").collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 0.5}
    flat = spark.createDataFrame([(1, 3.0), (2, 3.0)], "id long, score double")
    got = {r["id"]: r["nscore"] for r in minmax_normalize(flat, "score", "id").collect()}
    assert got == {1: 1.0, 2: 1.0}


def test_hybrid_weighted_matches_brute(spark):
    sparse = [(1, 10.0), (2, 8.0), (3, 5.0), (4, 1.0)]
    dense = [(3, 0.9), (5, 0.7), (1, 0.3)]
    sdf = spark.createDataFrame(sparse, "id long, score double")
    ddf = spark.createDataFrame(dense, "id long, score double")

    def norm(lst):
        lo, hi = min(s for _, s in lst), max(s for _, s in lst)
        return {i: 1.0 if hi == lo else (s - lo) / (hi - lo) for i, s in lst}

    ns, nd = norm(sparse), norm(dense)
    fused = {
        i: 0.7 * ns.get(i, 0.0) + 0.3 * nd.get(i, 0.0)
        for i in set(ns) | set(nd)
    }
    want = sorted(fused, key=lambda i: (-fused[i], i))[:3]
    got = hybrid_weighted_search(sdf, ddf, k=3, w_sparse=0.7, w_dense=0.3).collect()
    assert [r["id"] for r in got] == want
    for r in got:
        assert r["fused_score"] == pytest.approx(fused[r["id"]], rel=1e-12)


# ---------------------------------------------------------------- drift


def test_corpus_drift_matches_brute(spark):
    a = [(1, "x x y common common"), (2, "y z common")]
    b = [(3, "w w w common common"), (4, "z common")]
    adf = spark.createDataFrame(a, "doc_id long, text string")
    bdf = spark.createDataFrame(b, "doc_id long, text string")

    ca, cb = Counter(), Counter()
    for _, t in a:
        ca.update(oracle.tokenize(t))
    for _, t in b:
        cb.update(oracle.tokenize(t))
    vocab = sorted(set(ca) | set(cb))
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    want = {}
    for t in vocab:
        p = (ca[t] + 1) / (na + v)
        q = (cb[t] + 1) / (nb + v)
        m = (p + q) / 2
        want[t] = 0.5 * (p * math.log(p / m) + q * math.log(q / m))
    rows = corpus_drift_report(adf, bdf, top_k=10).collect()
    assert [r["term"] for r in rows] == sorted(
        vocab, key=lambda t: (-want[t], t)
    )[: len(rows)]
    for r in rows:
        assert r["jsd_nano"] == round(want[r["term"]] * 1e9)
        assert r["cnt_a"] == ca[r["term"]] and r["cnt_b"] == cb[r["term"]]
    # identical slices → zero drift everywhere
    same = corpus_drift_report(adf, adf, top_k=5).collect()
    assert all(r["jsd_nano"] == 0 for r in same)


def test_corpus_drift_guard(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        corpus_drift_report(df, df, top_k=0)


# ---------------------------------------------------------------- key dedup


def test_keep_best_per_key(spark):
    docs = [
        (1, "u1", "short text"),
        (2, "u1", "much longer text here wins"),
        (3, "u2", "same len a"),
        (4, "u2", "same len b"),          # tie: doc 3 wins (lower id)
        (5, None, "null key always kept"),
        (6, None, "another null kept"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {r["doc_id"]: r["keep"] for r in keep_best_per_key(sdf).collect()}
    assert got == {1: False, 2: True, 3: True, 4: False, 5: True, 6: True}


# ---------------------------------------------------------------- projected ANN


def test_projected_topk_exact_scores_and_recall(spark):
    rng = np.random.RandomState(9)
    # clustered vectors (the data the operator targets — iid gaussian
    # noise has no neighbors to find and distorts maximally under JL)
    centers = rng.randn(8, 64) * 3.0
    raw = np.vstack([centers[i % 8] + rng.randn(64) * 0.5 for i in range(200)])
    sdf = spark.createDataFrame(
        [(i, raw[i].tolist()) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    q = raw[0].tolist()
    got = projected_cosine_topk(sdf, q, k=10, out_dim=16, seed=3).collect()
    # returned scores are EXACT cosines
    qn = np.linalg.norm(raw[0])
    for r in got:
        want = float(raw[r["vec_id"]] @ raw[0] / (np.linalg.norm(raw[r["vec_id"]]) * qn))
        assert r["cosine"] == pytest.approx(want, rel=1e-9)
    # recall vs exact top-10 is high (vec 0 itself must be found)
    exact = np.argsort(-(raw @ raw[0]) / (np.linalg.norm(raw, axis=1) * qn))[:10]
    overlap = len(set(r["vec_id"] for r in got) & set(int(i) for i in exact))
    assert got[0]["vec_id"] == 0
    assert overlap >= 8


def test_projected_topk_guards(spark):
    sdf = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        projected_cosine_topk(sdf, [1.0, 0.0], k=0)
