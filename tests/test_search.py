"""Rank-identity gate: all scorers vs the pure-pandas oracle over the
reference query set (FIXTURES.md §3) — top-k docIDs in exact order,
scores to 1e-9 relative tolerance.

Analog of the reference's mock-driven + golden ranking tests
(src/test/java/webdata/ReviewSearchTest.java:75-233)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fulltextsearchengine_spark import datagen, oracle
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

K = 10


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    searcher = Searcher(build_index(sdf))
    vocab = datagen.make_vocab(2000, seed=42)
    queries = datagen.make_queries(vocab, n_queries=25, seed=7)
    return golden, searcher, queries


def _check_ranking(expected: list[tuple], got: list[tuple]):
    """Exact id order; scores close. Adjacent ids may swap only if their
    oracle scores are within 1 ulp-ish tolerance (cross-runtime log10)."""
    assert len(got) == len(expected)
    exp_ids = [e[0] for e in expected]
    got_ids = [g[0] for g in got]
    if exp_ids != got_ids:
        exp_scores = {e[0]: e[1] for e in expected}
        got_scores = {g[0]: g[1] for g in got}
        assert set(exp_ids) == set(got_ids), (exp_ids, got_ids)
        for a, b in zip(exp_ids, got_ids):
            if a != b:
                assert math.isclose(exp_scores[a], exp_scores[b], rel_tol=1e-12), (a, b)
    for (eid, es), gs in zip(expected, [g[1] for g in got]):
        assert es == pytest.approx(gs, rel=1e-9, abs=1e-300)


def test_vector_space_rank_identity(setup):
    golden, searcher, queries = setup
    for q in queries:
        exp = oracle.vector_space_search(golden, q, K)
        got = [(r["doc_id"], r["score"]) for r in searcher.vector_space_search(q, K).collect()]
        _check_ranking(exp, got)


def test_bm25_rank_identity(setup):
    golden, searcher, queries = setup
    for q in queries:
        exp = oracle.bm25_search(golden, q, K)
        got = [(r["doc_id"], r["score"]) for r in searcher.bm25_search(q, K).collect()]
        _check_ranking(exp, got)


def test_lm_rank_identity(setup):
    golden, searcher, queries = setup
    for q in queries:
        exp = oracle.language_model_search(golden, q, K)
        got = [(r["doc_id"], r["score"]) for r in searcher.language_model_search(q, K).collect()]
        _check_ranking(exp, got)


def test_conv_search_rank_identity(setup):
    golden, searcher, queries = setup
    for q in queries[:10]:
        exp = oracle.conv_search(golden, q, K)
        rows = searcher.conv_search(q, K).collect()
        got = [(r["conv_id"], r["relevancy"], r["rank"]) for r in rows]
        assert [g[0] for g in got] == [e[0] for e in exp]
        for e, g in zip(exp, got):
            assert e[1] == pytest.approx(g[1], rel=1e-9, abs=1e-300)
            assert e[2] == pytest.approx(g[2], rel=1e-9, abs=1e-300)


def test_conv_search_two_stage_orders_differ(spark):
    """Stage 2 is a REAL re-rank: a conv whose hits sit in assistant
    turns wins stage 1 (higher mean dot) but loses stage 2 (role weight
    0.5 vs 1.0) — mirrors the reference where getProductRank
    (helpfulness-weighted) reorders the relevancy winners
    (ReviewSearchTest.java:169-210)."""
    import pandas as pd

    from fulltextsearchengine_spark import oracle
    from fulltextsearchengine_spark.operators.index_build import build_index
    from fulltextsearchengine_spark.operators.search import Searcher
    from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    rows = [
        ("ca", 0, "user", "magic wand", None, None),
        ("ca", 1, "assistant", "plain filler text", None, None),
        ("cb", 0, "assistant", "magic magic wand wand", None, None),
        ("cb", 1, "user", "plain filler text", None, None),
        ("cc", 0, "user", "unrelated words entirely", None, None),
    ]
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32"})
    golden = oracle.build_index(pdf)
    q = ["magic", "wand"]
    exp = oracle.conv_search(golden, q, 2)
    # stage-1 (relevancy) order: cb first; final (rank) order: ca first
    assert sorted(exp, key=lambda x: -x[1])[0][0] == "cb"
    assert [e[0] for e in exp] == ["ca", "cb"]

    idx = build_index(spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA))
    got = [
        (r["conv_id"], r["relevancy"], r["rank"])
        for r in Searcher(idx).conv_search(q, 2).collect()
    ]
    assert [g[0] for g in got] == [e[0] for e in exp]
    for e, g in zip(exp, got):
        assert g[1] == pytest.approx(e[1], rel=1e-9)
        assert g[2] == pytest.approx(e[2], rel=1e-9)


def test_empty_query_and_oov(setup):
    _, searcher, _ = setup
    assert searcher.bm25_search([], K).count() == 0
    assert searcher.vector_space_search([], K).count() == 0
    assert searcher.language_model_search([], K).count() == 0
    assert searcher.bm25_search(["zzznotaword"], K).count() == 0
    assert searcher.conv_search([], K).count() == 0


def test_case_folding(setup):
    golden, searcher, _ = setup
    term = max(golden["term_to_document_frequency"], key=golden["term_to_document_frequency"].get)
    a = [(r["doc_id"], r["score"]) for r in searcher.bm25_search([term], K).collect()]
    b = [(r["doc_id"], r["score"]) for r in searcher.bm25_search([term.upper()], K).collect()]
    assert a == b and len(a) > 0


def test_lnnltc_mixed_case_duplicates(setup):
    """Reference parity (ReviewSearch.queryLtc counts RAW-case terms,
    folding happens only at dictionary lookup): ["Dog", "dog"] is TWO
    unit-tf query components that collapse onto one indexed term —
    scores come out √2× the single-term query, not the (1+log10 2)
    folded-tf weighting."""
    golden, searcher, _ = setup
    term = max(golden["term_to_document_frequency"], key=golden["term_to_document_frequency"].get)
    q = [term.upper(), term]
    exp = oracle.vector_space_search(golden, q, K)
    got = [(r["doc_id"], r["score"]) for r in searcher.vector_space_search(q, K).collect()]
    _check_ranking(exp, got)
    single = [(r["doc_id"], r["score"]) for r in searcher.vector_space_search([term], K).collect()]
    assert got[0][0] == single[0][0]
    assert got[0][1] == pytest.approx(single[0][1] * math.sqrt(2), rel=1e-12)


def test_bm25_batch_matches_single(setup):
    """Batched multi-query BM25 (one job) == per-query results."""
    golden, searcher, queries = setup
    batch = {f"q{i}": q for i, q in enumerate(queries[:8]) if q}
    rows = searcher.bm25_search_batch(batch, K).collect()
    got: dict[str, list[tuple[int, float]]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in batch.items():
        exp = oracle.bm25_search(golden, q, K)
        _check_ranking(exp, got.get(qid, []))


def test_sql_surface_matches_dataframe(setup):
    """spark.sql over registered views == the DataFrame scorer."""
    from fulltextsearchengine_spark.sql import bm25_sql, register_index_views

    golden, searcher, _ = setup
    register_index_views(searcher.index.postings.sparkSession, searcher.index)
    q = sorted(golden["term_to_document_frequency"])[:3]
    spark = searcher.index.postings.sparkSession
    rows = spark.sql(bm25_sql(q, K)).collect()
    exp = oracle.bm25_search(golden, q, K)
    _check_ranking(exp, [(r["doc_id"], r["score"]) for r in rows])


def test_faceted_search(setup):
    """Per-facet counts and top-k equal a brute-force regroup of the
    full BM25 candidate set (scores via the engine's own scorer, facet
    membership via docs) — and rank 1 per facet is that facet's global
    best candidate."""
    from collections import defaultdict

    from fulltextsearchengine_spark.operators.facets import faceted_search

    golden, searcher, queries = setup
    role_of = {
        r["doc_id"]: r["role"] for r in searcher.index.docs.select("doc_id", "role").collect()
    }
    for q in queries[:5]:
        scored = {r["doc_id"]: r["score"] for r in searcher.bm25_scores(q).collect()}
        by_facet = defaultdict(list)
        for did, sc in scored.items():
            by_facet[role_of[did]].append((did, sc))
        got = faceted_search(searcher, q, facet_col="role", per_facet_k=3).collect()
        if not scored:
            assert got == []
            continue
        got_by_facet = defaultdict(list)
        for r in got:
            got_by_facet[r["facet"]].append(r)
        assert set(got_by_facet) == set(by_facet)
        for facet, cand in by_facet.items():
            rows = sorted(got_by_facet[facet], key=lambda r: r["facet_rank"])
            exp = sorted(cand, key=lambda x: (-x[1], x[0]))[:3]
            assert [r["doc_id"] for r in rows] == [e[0] for e in exp], (q, facet)
            for r, (eid, esc) in zip(rows, exp):
                assert r["score_micro"] == round(esc * 1e6)
                assert r["facet_hits"] == len(cand)
            assert [r["facet_rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_faceted_search_over_prescored(setup):
    """scores= composes facets with any scorer: faceting the msm
    candidate set equals brute-regrouping bm25_scores_msm output, and
    passing both/neither of query=/scores= raises."""
    from collections import defaultdict

    import pytest as _pytest

    from fulltextsearchengine_spark.operators.facets import faceted_search

    golden, searcher, queries = setup
    q = queries[0] + queries[1]
    role_of = {
        r["doc_id"]: r["role"]
        for r in searcher.index.docs.select("doc_id", "role").collect()
    }
    pre = searcher.bm25_scores_msm(q, 2)
    scored = {r["doc_id"]: r["score"] for r in pre.collect()}
    by_facet = defaultdict(list)
    for did, sc in scored.items():
        by_facet[role_of[did]].append((did, sc))
    got = faceted_search(searcher, facet_col="role", per_facet_k=3, scores=pre).collect()
    got_by_facet = defaultdict(list)
    for r in got:
        got_by_facet[r["facet"]].append(r)
    assert set(got_by_facet) == set(by_facet)
    for facet, cand in by_facet.items():
        rows = sorted(got_by_facet[facet], key=lambda r: r["facet_rank"])
        exp = sorted(cand, key=lambda x: (-x[1], x[0]))[:3]
        assert [r["doc_id"] for r in rows] == [e[0] for e in exp], facet
        assert all(r["facet_hits"] == len(cand) for r in rows)
    with _pytest.raises(ValueError, match="exactly one"):
        faceted_search(searcher, q, scores=pre)
    with _pytest.raises(ValueError, match="exactly one"):
        faceted_search(searcher)


def test_bm25_search_after_pagination(setup):
    """Chained keyset pages reassemble exactly the top-3k list (no gap,
    no overlap, no reordering), and an exhausted cursor returns empty."""
    golden, searcher, queries = setup
    for q in queries[:3]:
        full = [(r["doc_id"], r["score"]) for r in searcher.bm25_search(q, 30).collect()]
        pages, cursor = [], None
        for _ in range(3):
            if cursor is None:
                page = searcher.bm25_search(q, 10).collect()
            else:
                page = searcher.bm25_search_after(q, 10, *cursor).collect()
            if not page:
                break
            pages += [(r["doc_id"], r["score"]) for r in page]
            cursor = (page[-1]["score"], page[-1]["doc_id"])
        assert pages == full, q
        if len(full) == 30:  # cursor past the end of a longer list still pages
            nxt = searcher.bm25_search_after(q, 10, *cursor).collect()
            more = [(r["doc_id"], r["score"]) for r in searcher.bm25_search(q, 40).collect()][30:]
            assert [(r["doc_id"], r["score"]) for r in nxt] == more[:10]


def test_retrieval_eval(setup):
    """Known-item eval ranks match a brute-force recompute: probe query
    terms by tf·idf rule, probe rank via the python BM25 oracle."""
    from fulltextsearchengine_spark.operators.evaluation import (
        probe_queries,
        retrieval_eval,
    )

    golden, searcher, queries = setup
    probes = [1, 5, 9, 13, 27]
    qmap = probe_queries(searcher, probes, m=3)
    # probe query terms vs brute force over the golden index
    n = golden["num_docs"]
    dfs = golden["term_to_document_frequency"]
    for d in probes:
        # postings are flat [doc_id, tf, doc_id, tf, ...] lists
        tfs = {
            t: post[i + 1]
            for t, post in golden["term_to_postings"].items()
            for i in range(0, len(post), 2)
            if post[i] == d
        }
        exp_terms = [
            t for _, t in sorted(
                (-(tf * math.log(n / dfs[t])), t) for t, tf in tfs.items()
            )[:3]
        ]
        assert qmap[d] == exp_terms, d
    got = {r["probe_doc_id"]: r for r in retrieval_eval(searcher, probes, m=3, k=10).collect()}
    for d in probes:
        exp = oracle.bm25_search(golden, qmap[d], 10)
        rank = next((i + 1 for i, (did, _) in enumerate(exp) if did == d), 0)
        assert got[d]["rank_at_k"] == rank, d
        assert got[d]["rr_micro"] == (round(1e6 / rank) if rank else 0)
