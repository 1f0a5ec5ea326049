"""Context-aware completion (suggest_next_terms) vs brute-force
co-occurrence over the golden corpus."""

from __future__ import annotations

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.suggest import suggest_next_terms
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    return golden, build_index(sdf)


def _brute(golden, context, prefix, k):
    ctx = sorted({t.lower() for t in context})
    ctx_docs = set()
    for t in ctx:
        ctx_docs |= set(oracle._postings_map(golden, t))
    cf = {t: sum(flat[1::2]) for t, flat in golden["term_to_postings"].items()}
    rows = []
    for t in cf:
        if not t.startswith(prefix) or t in ctx:
            continue
        co = len(set(oracle._postings_map(golden, t)) & ctx_docs)
        rows.append((t, co, cf[t]))
    rows.sort(key=lambda r: (-r[1], -r[2], r[0]))
    return rows[:k]


def test_suggest_matches_bruteforce(setup):
    golden, idx = setup
    for ctx, pref in ([["aa"], "d"], [["aa", "db"], "f"], [["he"], "a"]):
        want = _brute(golden, ctx, pref, 5)
        got = [
            (r["term"], r["co_docs"], r["cf"])
            for r in suggest_next_terms(idx, ctx, pref, 5).collect()
        ]
        assert got == want, (ctx, pref)


def test_suggest_empty_context_is_cf_order(setup):
    golden, idx = setup
    got = [
        (r["term"], r["co_docs"], r["cf"])
        for r in suggest_next_terms(idx, [], "a", 5).collect()
    ]
    assert got == _brute(golden, [], "a", 5)
    assert all(co == 0 for _, co, _ in got)
    with pytest.raises(ValueError):
        suggest_next_terms(idx, ["aa"], "", 5)
