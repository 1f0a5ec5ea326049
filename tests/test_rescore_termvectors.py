"""Rescore, term-vectors, and hits-time-histogram vs brute-force
Python oracles over the golden corpus."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.rescore import rescore_search
from fulltextsearchengine_spark.operators.search import LM_DIRICHLET_MU, Searcher
from fulltextsearchengine_spark.operators.termvectors import term_vectors
from fulltextsearchengine_spark.operators.facets import hits_time_histogram
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

K = 10
WINDOW = 30
Q = ["aa", "ahc", "auir"]


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    return golden, Searcher(idx), idx, sdf


def _brute_scores(golden, query):
    """(bm25, dirichlet) per doc over the OR candidate set."""
    n = golden["num_docs"]
    total = golden["total_tokens"]
    avgdl = total / n
    qtf = Counter(t.lower() for t in query)
    terms = sorted(qtf)
    first: dict[int, float] = {}
    second: dict[int, float] = {}
    # candidate set = union of posting docs over in-vocab terms
    cand = set()
    posts = {}
    for t in terms:
        posts[t] = oracle._postings_map(golden, t)
        cand |= set(posts[t])
    for d in cand:
        dl = golden["doc_to_length"][d]
        s1 = 0.0
        s2 = 0.0
        for t in terms:
            post = posts[t]
            df = len(post)
            if df == 0:
                continue
            tf = post.get(d, 0)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s1 += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
            cf = sum(post.values())
            s2 += qtf[t] * math.log(
                (tf + LM_DIRICHLET_MU * cf / total) / (dl + LM_DIRICHLET_MU)
            )
        first[d] = s1
        second[d] = s2
    return first, second


def test_rescore_matches_brute(setup):
    golden, searcher, idx, _ = setup
    first, second = _brute_scores(golden, Q)
    window = sorted(first, key=lambda d: (-first[d], d))[:WINDOW]
    blended = {d: 1.0 * first[d] + 0.5 * second[d] for d in window}
    want = sorted(blended, key=lambda d: (-blended[d], d))[:K]
    got = rescore_search(
        searcher, Q, k=K, window_size=WINDOW, rescore_weight=0.5
    ).collect()
    assert [r["doc_id"] for r in got] == want
    for r in got:
        assert r["score"] == pytest.approx(blended[r["doc_id"]], rel=1e-9)
        assert r["first_score"] == pytest.approx(first[r["doc_id"]], rel=1e-9)
        assert r["second_score"] == pytest.approx(second[r["doc_id"]], rel=1e-9)


def test_rescore_window_cuts_candidates(setup):
    """A doc ranked inside top-k by blended score but OUTSIDE the
    first-pass window must not appear (ES window semantics)."""
    golden, searcher, *_ = setup
    first, second = _brute_scores(golden, Q)
    # tiny window: heavily tilt toward the second scorer
    window = sorted(first, key=lambda d: (-first[d], d))[:K]
    blended = {d: 0.0 * first[d] + 1.0 * second[d] for d in window}
    want = sorted(blended, key=lambda d: (-blended[d], d))[:K]
    got = rescore_search(
        searcher, Q, k=K, window_size=K, query_weight=0.0, rescore_weight=1.0
    ).collect()
    assert [r["doc_id"] for r in got] == want
    assert set(r["doc_id"] for r in got) <= set(window)


def test_rescore_external_second_scores(setup, spark):
    golden, searcher, *_ = setup
    first, _ = _brute_scores(golden, Q)
    window = sorted(first, key=lambda d: (-first[d], d))[:WINDOW]
    ext = {d: float(d % 7) for d in window[: WINDOW // 2]}  # partial coverage
    ext_df = spark.createDataFrame(
        [(d, s) for d, s in ext.items()], "doc_id long, score double"
    )
    blended = {d: first[d] + 2.0 * ext.get(d, 0.0) for d in window}
    want = sorted(blended, key=lambda d: (-blended[d], d))[:K]
    got = rescore_search(
        searcher, Q, k=K, window_size=WINDOW, rescore_weight=2.0,
        second_scores=ext_df,
    ).collect()
    assert [r["doc_id"] for r in got] == want


def test_rescore_guards(setup):
    _, searcher, *_ = setup
    with pytest.raises(ValueError):
        rescore_search(searcher, Q, k=0)
    with pytest.raises(ValueError):
        rescore_search(searcher, Q, k=10, window_size=5)


# ---------------------------------------------------------------- term vectors


def test_term_vectors_match_brute(setup, small_transcripts_pdf):
    golden, searcher, idx, sdf = setup
    docs_text = oracle.assign_doc_ids(small_transcripts_pdf)
    ids = [1, 7, 42]
    want = []
    for d in ids:
        text = docs_text.loc[docs_text["doc_id"] == d, "text"].iloc[0]
        for t, tf in sorted(Counter(oracle.tokenize(text)).items()):
            post = oracle._postings_map(golden, t)
            want.append((d, t, tf, len(post), sum(post.values())))
    sdf_ids = sdf.sparkSession.createDataFrame(
        docs_text[["doc_id", "text"]], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["df"], r["cf"])
        for r in term_vectors(sdf_ids, idx, ids).collect()
    )
    assert got == sorted(want)


def test_term_vectors_guard(setup):
    _, _, idx, sdf = setup
    with pytest.raises(ValueError):
        term_vectors(sdf, idx, [])


# ---------------------------------------------------------------- histogram


def test_hits_histogram_matches_brute(setup, small_transcripts_pdf):
    golden, searcher, idx, _ = setup
    first, _ = _brute_scores(golden, Q)
    docs_text = oracle.assign_doc_ids(small_transcripts_pdf)
    ts_by_doc = dict(zip(docs_text["doc_id"], docs_text["ts"]))
    buckets: dict = {}
    for d, s in first.items():
        b = ts_by_doc[d].floor("h")
        agg = buckets.setdefault(b, [0, 0, None])
        agg[0] += 1
        agg[1] += round(s * 1e6)
        m = round(s * 1e6)
        agg[2] = m if agg[2] is None else max(agg[2], m)
    got = {
        r["bucket_ts"]: (r["n_hits"], r["sum_score_micro"], r["max_score_micro"])
        for r in hits_time_histogram(searcher, Q, granularity="hour").collect()
    }
    want = {b.to_pydatetime(): tuple(v) for b, v in buckets.items()}
    assert got == want


def test_hits_histogram_guards(setup):
    _, searcher, *_ = setup
    with pytest.raises(ValueError):
        hits_time_histogram(searcher)
    with pytest.raises(ValueError):
        hits_time_histogram(searcher, Q, granularity="fortnight")
