"""Session-6 ranking extensions vs brute-force Python oracles:
Dirichlet LM, collapsed (per-conv) top-k, synonym expansion, BM25
explanation, champion-list tiered retrieval."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.champions import (
    build_champion_lists,
    champion_bm25_search,
)
from fulltextsearchengine_spark.operators.collapse import collapsed_bm25_search
from fulltextsearchengine_spark.operators.explain import explain_bm25
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.search import (
    LM_DIRICHLET_MU,
    Searcher,
)
from fulltextsearchengine_spark.operators.synonyms import (
    expand_with_synonyms,
    synonym_bm25_search,
)
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

K = 10
QUERIES = [
    ["aa", "ahc", "auir"],
    ["db", "doa", "eoi"],
    ["he", "hg", "hn"],
]


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    searcher = Searcher(build_index(sdf))
    return golden, searcher


# ------------------------------------------------------------- Dirichlet


def _brute_dirichlet(golden, query, mu, k):
    qtf = Counter(t.lower() for t in query)
    total = golden["total_tokens"]
    terms = sorted(
        t for t in qtf if golden["term_to_collection_frequency"].get(t, 0) > 0
    )
    cands: set[int] = set()
    for t in terms:
        cands |= set(oracle._postings_map(golden, t))
    scores: dict[int, float] = {}
    for d in cands:
        dl = golden["doc_to_length"][d]
        s = 0.0
        for t in terms:
            tf = oracle._postings_map(golden, t).get(d, 0)
            p_c = golden["term_to_collection_frequency"][t] / total
            s += qtf[t] * math.log((tf + mu * p_c) / (dl + mu))
        scores[d] = s
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]


@pytest.mark.parametrize("q", QUERIES)
def test_dirichlet_rank_identity(setup, q):
    golden, searcher = setup
    expected = _brute_dirichlet(golden, q, LM_DIRICHLET_MU, K)
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.lm_dirichlet_search(q, K).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (_, a), (_, b) in zip(got, expected):
        assert a == pytest.approx(b, rel=1e-12)


def test_dirichlet_qtf_multiplicity_matters(setup):
    golden, searcher = setup
    # duplicated term weights its factor twice — different scores than distinct
    q1, q2 = ["aa", "aa", "ahc"], ["aa", "ahc"]
    s1 = {r["doc_id"]: r["score"] for r in searcher.lm_dirichlet_search(q1, K).collect()}
    s2 = {r["doc_id"]: r["score"] for r in searcher.lm_dirichlet_search(q2, K).collect()}
    assert s1 != s2


def test_dirichlet_oov_only_query_empty(setup):
    _, searcher = setup
    assert searcher.lm_dirichlet_search(["zzzznotaterm"], K).count() == 0


# -------------------------------------------------------------- collapse


def _brute_collapsed(golden, query, k, per_conv):
    full = oracle.bm25_search(golden, [t.lower() for t in query], 10**9)
    seen: dict[str, int] = {}
    out = []
    for doc_id, score in full:
        conv = golden["doc_to_meta"][doc_id]["conv_id"]
        if seen.get(conv, 0) < per_conv:
            seen[conv] = seen.get(conv, 0) + 1
            out.append((doc_id, conv, score))
    return out[:k]


@pytest.mark.parametrize("per_conv", [1, 2])
def test_collapsed_matches_brute_force(setup, per_conv):
    golden, searcher = setup
    for q in QUERIES:
        expected = _brute_collapsed(golden, q, K, per_conv)
        got = [
            (r["doc_id"], r["conv_id"], r["score"])
            for r in collapsed_bm25_search(searcher, q, K, per_conv).collect()
        ]
        assert [(d, c) for d, c, _ in got] == [(d, c) for d, c, _ in expected]
        for (_, _, a), (_, _, b) in zip(got, expected):
            assert a == pytest.approx(b, rel=1e-12)
        convs = [c for _, c, _ in got]
        assert max(Counter(convs).values()) <= per_conv


def test_collapsed_rejects_bad_per_conv(setup):
    _, searcher = setup
    with pytest.raises(ValueError):
        collapsed_bm25_search(searcher, ["aa"], K, per_conv=0)


def test_collapse_and_recency_compose_with_prescored(setup):
    """scores= routes any scorer through collapse/recency: identity with
    the query= path when fed plain bm25_scores, plus argument guards."""
    from fulltextsearchengine_spark.operators.recency import recency_boosted_scores

    golden, searcher = setup
    q = QUERIES[0]
    pre = searcher.bm25_scores(q)
    via_scores = [
        (r["doc_id"], r["conv_id"], r["score"])
        for r in collapsed_bm25_search(searcher, k=K, per_conv=1, scores=pre).collect()
    ]
    via_query = [
        (r["doc_id"], r["conv_id"], r["score"])
        for r in collapsed_bm25_search(searcher, q, K, per_conv=1).collect()
    ]
    assert via_scores == via_query
    now = "2026-01-01 00:00:00"
    rs = {
        r["doc_id"]: r["score"]
        for r in recency_boosted_scores(searcher, now=now, scores=pre).collect()
    }
    rq = {
        r["doc_id"]: r["score"]
        for r in recency_boosted_scores(searcher, q, now).collect()
    }
    assert rs == rq and rs
    with pytest.raises(ValueError, match="exactly one"):
        collapsed_bm25_search(searcher, q, K, scores=pre)
    with pytest.raises(ValueError, match="exactly one"):
        recency_boosted_scores(searcher, now=now)
    with pytest.raises(ValueError, match="now="):
        recency_boosted_scores(searcher, q)


# -------------------------------------------------------------- synonyms

SYNS = {"aa": ["db", "zzneverseen"], "he": ["hg"]}


def _brute_weighted_bm25(golden, weights, k):
    n = golden["num_docs"]
    avgdl = golden["total_tokens"] / n
    acc: dict[int, float] = {}
    for term in sorted(t for t, w in weights.items() if w > 0):
        df = golden["term_to_document_frequency"].get(term, 0)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for doc_id, tf in oracle._postings_map(golden, term).items():
            dl = golden["doc_to_length"][doc_id]
            denom = tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
            acc[doc_id] = acc.get(doc_id, 0.0) + weights[term] * idf * tf * 2.2 / denom
    return sorted(acc.items(), key=lambda x: (-x[1], x[0]))[:k]


def test_synonym_expansion_weights():
    w = expand_with_synonyms(["aa", "he", "db"], SYNS, syn_weight=0.4)
    # db is both an original term and a synonym of aa: weights sum
    assert w == {
        "aa": 1.0,
        "db": pytest.approx(1.4),
        "zzneverseen": pytest.approx(0.4),
        "he": 1.0,
        "hg": pytest.approx(0.4),
    }
    with pytest.raises(ValueError):
        expand_with_synonyms(["aa"], SYNS, syn_weight=0.0)


def test_synonym_search_matches_brute_force(setup):
    golden, searcher = setup
    q = ["aa", "he"]
    weights = expand_with_synonyms(q, SYNS, syn_weight=0.4)
    expected = _brute_weighted_bm25(golden, weights, K)
    got = [
        (r["doc_id"], r["score"])
        for r in synonym_bm25_search(searcher, q, SYNS, K, syn_weight=0.4).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (_, a), (_, b) in zip(got, expected):
        assert a == pytest.approx(b, rel=1e-12)


def test_synonym_search_beats_plain_on_vocab_mismatch(setup):
    """A doc containing only synonyms of the query terms is reachable
    with expansion and unreachable without."""
    _, searcher = setup
    plain = {r["doc_id"] for r in searcher.bm25_search(["aa"], 10**6).collect()}
    expanded = {
        r["doc_id"]
        for r in synonym_bm25_search(searcher, ["aa"], {"aa": ["db"]}, 10**6).collect()
    }
    assert plain < expanded  # strictly more reachable docs


# --------------------------------------------------------------- explain


def test_explain_contribs_sum_to_score(setup):
    golden, searcher = setup
    for q in QUERIES:
        rows = explain_bm25(searcher, q, K).collect()
        assert rows, "explanation should be non-empty for matching queries"
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        top = oracle.bm25_search(golden, [t.lower() for t in q], K)
        assert set(by_doc) == {d for d, _ in top}
        for doc_id, score in top:
            rs = by_doc[doc_id]
            assert sum(x["contrib"] for x in rs) == pytest.approx(score, rel=1e-9)
            assert all(x["score"] == pytest.approx(score, rel=1e-12) for x in rs)
            for x in rs:
                assert x["tf"] == oracle._postings_map(golden, x["term"])[doc_id]
                assert x["df"] == golden["term_to_document_frequency"][x["term"]]
                assert x["doc_len"] == golden["doc_to_length"][doc_id]


def test_explain_oov_query_is_empty(setup):
    _, searcher = setup
    assert explain_bm25(searcher, ["zzzznotaterm"], K).count() == 0


# ------------------------------------------------------------- champions


def test_champion_lists_shape(setup):
    golden, searcher = setup
    n = 3
    tier = build_champion_lists(searcher.index.postings, n).collect()
    per_term: dict[str, list] = {}
    for r in tier:
        per_term.setdefault(r["term"], []).append((r["doc_id"], r["tf"]))
    for term, entries in per_term.items():
        pm = oracle._postings_map(golden, term)
        expected = sorted(pm.items(), key=lambda x: (-x[1], x[0]))[:n]
        assert sorted(entries, key=lambda x: (-x[1], x[0])) == expected
    with pytest.raises(ValueError):
        build_champion_lists(searcher.index.postings, 0)


def test_champion_search_exact_at_full_tier(setup):
    """n_champions >= max df → candidates = full OR-union → identical
    to the exact scorer."""
    golden, searcher = setup
    for q in QUERIES:
        exact = [(r["doc_id"], r["score"]) for r in searcher.bm25_search(q, K).collect()]
        got = [
            (r["doc_id"], r["score"])
            for r in champion_bm25_search(searcher, q, K, n_champions=10**6).collect()
        ]
        assert got == exact


def test_champion_search_matches_restricted_brute_force(setup):
    """Default path = IMPACT-ordered champions (tf·2.2/(tf+1.2·norm)):
    the per-term component BM25 actually ranks by — raw-tf ordering
    favors long docs that length normalization then demotes."""
    golden, searcher = setup
    n = 5
    navg = golden["total_tokens"] / golden["num_docs"]

    def impact(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / navg))

    for q in QUERIES:
        terms = sorted({t.lower() for t in q})
        cands: set[int] = set()
        for t in terms:
            pm = oracle._postings_map(golden, t)
            ranked = sorted(
                pm.items(),
                key=lambda x: (-impact(x[1], golden["doc_to_length"][x[0]]), x[0]),
            )
            cands |= {d for d, _ in ranked[:n]}
        full = oracle.bm25_search(golden, terms, 10**9)
        expected = [(d, s) for d, s in full if d in cands][:K]
        got = [
            (r["doc_id"], r["score"])
            for r in champion_bm25_search(searcher, q, K, n_champions=n).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in expected]
        for (_, a), (_, b) in zip(got, expected):
            assert a == pytest.approx(b, rel=1e-12)


def test_champion_impact_ordering_beats_tf_on_recall(setup):
    """On the golden corpus, impact-ordered tiers recall at least as
    much of the exact top-k as raw-tf tiers at the same n (they differ:
    the corpus has enough doc-length spread for normalization to bite)."""
    golden, searcher = setup
    from fulltextsearchengine_spark.operators.champions import build_champion_lists

    navg = golden["total_tokens"] / golden["num_docs"]
    tf_tier = build_champion_lists(searcher.index.postings, 5).cache()
    imp_tier = build_champion_lists(searcher.index.postings, 5, avgdl=navg).cache()
    rec_tf = rec_imp = 0
    for q in QUERIES:
        exact = {d for d, _ in oracle.bm25_search(golden, q, K)}
        got_tf = {
            r["doc_id"]
            for r in champion_bm25_search(searcher, q, K, champions=tf_tier).collect()
        }
        got_imp = {
            r["doc_id"]
            for r in champion_bm25_search(searcher, q, K, champions=imp_tier).collect()
        }
        rec_tf += len(exact & got_tf)
        rec_imp += len(exact & got_imp)
    assert rec_imp >= rec_tf
