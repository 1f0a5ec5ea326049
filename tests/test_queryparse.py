"""Query-language parser + execution vs brute-force filtering of the
oracle's full BM25 ranking."""

from __future__ import annotations

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.positions import build_positional_postings
from fulltextsearchengine_spark.operators.queryparse import (
    ParsedQuery,
    execute_query,
    parse_query,
)
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

K = 10


def test_parse_query_grammar():
    pq = parse_query('spark Join-Fast "table hash" -noise -"bad one" role:User conv:conv_000042')
    assert pq.terms == ["spark", "join", "fast"]
    assert pq.phrases == [["table", "hash"]]
    assert pq.excluded_terms == ["noise"]
    assert pq.excluded_phrases == [["bad", "one"]]
    assert pq.filters == {"role": "user", "conv": "conv_000042"}
    # empty clauses are dropped; bare '-' and dangling 'role:' are not fields
    empty = parse_query('"" ')
    assert empty == ParsedQuery()
    assert parse_query("tool:search").filters == {"tool": "search"}


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    docs = oracle.assign_doc_ids(small_transcripts_pdf)
    doc_tokens = {r.doc_id: oracle.tokenize(r.text) for r in docs.itertuples(index=False)}
    return golden, Searcher(idx), build_positional_postings(sdf).cache(), doc_tokens


def _contains_phrase(toks: list[str], ph: list[str]) -> bool:
    n = len(ph)
    return any(toks[i : i + n] == ph for i in range(len(toks) - n + 1))


def test_execute_query_vs_bruteforce(setup):
    golden, searcher, posp, doc_tokens = setup
    meta = golden["doc_to_meta"]
    # pick a real bigram so phrase clauses actually select
    some_doc = next(d for d, t in doc_tokens.items() if len(t) >= 2)
    ph = doc_tokens[some_doc][:2]
    ex_term = doc_tokens[some_doc][-1]
    cases = [
        (f'{ph[0]} {ph[1]} role:user', None),
        (f'"{ph[0]} {ph[1]}"', "phrase"),
        (f'{ph[0]} {ph[1]} -{ex_term}', None),
        (f'{ph[0]} {ph[1]} -"{ph[0]} {ph[1]}"', "phrase"),
    ]
    for qstr, _ in cases:
        pq = parse_query(qstr)
        terms = pq.terms + [t for p in pq.phrases for t in p]
        full = oracle.bm25_search(golden, terms, golden["num_docs"])
        exp = []
        for d, s in full:
            m = meta[d]
            if "role" in pq.filters and m["role"].lower() != pq.filters["role"]:
                continue
            if any(t in doc_tokens[d] for t in pq.excluded_terms):
                continue
            if any(not _contains_phrase(doc_tokens[d], p) for p in pq.phrases):
                continue
            if any(_contains_phrase(doc_tokens[d], p) for p in pq.excluded_phrases):
                continue
            exp.append((d, s))
        exp = exp[:K]
        got = execute_query(searcher, qstr, k=K, pos_postings=posp).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], qstr
        for r, (_, s) in zip(got, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9)


def test_execute_query_guards(setup):
    _, searcher, posp, _ = setup
    with pytest.raises(ValueError):
        execute_query(searcher, '"table hash"', pos_postings=None)
    with pytest.raises(ValueError):
        execute_query(searcher, "-only -negative", pos_postings=posp)


def test_parse_proximity_clause():
    from fulltextsearchengine_spark.operators.queryparse import parse_query

    pq = parse_query('spark "table hash"~2 -"bad scan"~1 role:user')
    assert pq.terms == ["spark"]
    assert pq.proximities == [(["table", "hash"], 2)]
    assert pq.excluded_proximities == [(["bad", "scan"], 1)]
    assert pq.phrases == [] and pq.excluded_phrases == []
    # plain quoted phrase still parses as exact-adjacency
    assert parse_query('"table hash"').phrases == [["table", "hash"]]


def test_execute_query_proximity_clause(setup):
    from fulltextsearchengine_spark.operators.queryparse import execute_query
    from fulltextsearchengine_spark.operators.positions import min_window_spans

    golden, searcher, posp, doc_tokens = setup
    some_doc = next(d for d, t in doc_tokens.items() if len(t) >= 3)
    a, b = doc_tokens[some_doc][0], doc_tokens[some_doc][2]  # gap of 1
    q = f'"{a} {b}"~1'
    got = {r["doc_id"] for r in execute_query(searcher, q, k=10**6, pos_postings=posp).collect()}
    # expected: BM25 candidates restricted to min-window <= m+1
    m = len({a, b})
    win = {
        r["doc_id"]
        for r in min_window_spans(posp, [a, b]).collect()
        if r["min_span"] <= m + 1
    }
    full = {d for d, _ in oracle.bm25_search(golden, [a, b] if a != b else [a], golden["num_docs"])}
    assert got == (full & win) and some_doc in got


def test_time_range_filters(setup, small_transcripts_pdf):
    from fulltextsearchengine_spark.operators.queryparse import execute_query, parse_query

    golden, searcher, posp, doc_tokens = setup
    ts_of = {
        r.doc_id: r.ts.to_pydatetime()
        for r in oracle.assign_doc_ids(small_transcripts_pdf).itertuples(index=False)
    }
    some_doc = next(iter(doc_tokens))
    term = doc_tokens[some_doc][0]
    all_ts = sorted(ts_of.values())
    cut = all_ts[len(all_ts) // 2]
    cut_iso = cut.isoformat(sep="T")
    got_after = {
        r["doc_id"]
        for r in execute_query(searcher, f"{term} after:{cut_iso}", k=10**6).collect()
    }
    got_before = {
        r["doc_id"]
        for r in execute_query(searcher, f"{term} before:{cut_iso}", k=10**6).collect()
    }
    full = {d for d, _ in oracle.bm25_search(golden, [term], golden["num_docs"])}
    exp_after = {d for d in full if ts_of[d] >= cut}
    exp_before = {d for d in full if ts_of[d] < cut}
    assert got_after == exp_after and got_before == exp_before
    assert got_after and got_before  # both sides populated
    with pytest.raises(ValueError):
        parse_query("x after:notadate")
    # tz-aware forms are rejected: fromisoformat would accept them but
    # Spark re-interprets in the session timezone (ADVICE r3)
    with pytest.raises(ValueError, match="timezone-aware"):
        parse_query("x after:2026-01-01T00:00:00+05:00")
    with pytest.raises(ValueError, match="timezone-aware"):
        parse_query("x before:2026-01-01T00:00:00Z")


def test_mm_clause(setup):
    from fulltextsearchengine_spark.operators.queryparse import execute_query, parse_query

    golden, searcher, _, doc_tokens = setup
    # three mid-df terms; mm:2 must equal the brute >=2-distinct-term filter
    q_terms = ["aa", "db", "fh"]
    pq = parse_query("aa db fh mm:2")
    assert pq.min_should_match == 2 and pq.terms == q_terms
    got = [
        (r["doc_id"], r["score"])
        for r in execute_query(searcher, "aa db fh mm:2", k=10**6).collect()
    ]
    matched = {
        d: sum(t in toks for t in q_terms) for d, toks in doc_tokens.items()
    }
    exp = [
        (d, s)
        for d, s in oracle.bm25_search(golden, q_terms, golden["num_docs"])
        if matched[d] >= 2
    ]
    exp.sort(key=lambda x: (-x[1], x[0]))
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (_, es), (_, gs) in zip(exp, got):
        assert gs == pytest.approx(es, rel=1e-9)
    # default mm=1 is the plain OR union
    assert parse_query("aa db fh").min_should_match == 1
    # composes with metadata filters (role) — mm prunes first, role after
    got_role = {
        r["doc_id"]
        for r in execute_query(searcher, "aa db fh mm:2 role:user", k=10**6).collect()
    }
    assert got_role <= {g[0] for g in got}
    with pytest.raises(ValueError, match="bad mm"):
        parse_query("aa db mm:0")
    with pytest.raises(ValueError, match="bad mm"):
        parse_query("aa db mm:two")
    with pytest.raises(ValueError, match="min_should_match"):
        execute_query(searcher, "aa db mm:7", k=5)


def test_sort_clause(setup, small_transcripts_pdf):
    from fulltextsearchengine_spark.operators.queryparse import execute_query, parse_query

    golden, searcher, _, doc_tokens = setup
    ts_of = {
        r.doc_id: r.ts.to_pydatetime()
        for r in oracle.assign_doc_ids(small_transcripts_pdf).itertuples(index=False)
    }
    some_doc = next(iter(doc_tokens))
    term = doc_tokens[some_doc][0]
    full = {d for d, _ in oracle.bm25_search(golden, [term], golden["num_docs"])}
    pq = parse_query(f"{term} sort:-ts")
    assert pq.sort == ("ts", True)
    got = [r["doc_id"] for r in execute_query(searcher, f"{term} sort:-ts", k=7).collect()]
    exp = sorted(full, key=lambda d: (ts_of[d],), reverse=True)
    # reverse=True breaks doc_id ties the wrong way; apply exact key
    exp = sorted(full, key=lambda d: (-ts_of[d].timestamp(), d))[:7]
    assert got == exp
    got_asc = [
        r["doc_id"] for r in execute_query(searcher, f"{term} sort:ts", k=7).collect()
    ]
    assert got_asc == sorted(full, key=lambda d: (ts_of[d].timestamp(), d))[:7]
    # sort composes with filters; score column still returned
    rows = execute_query(searcher, f"{term} role:user sort:-turn_idx", k=5).collect()
    assert rows and all(r["score"] > 0 for r in rows)
    with pytest.raises(ValueError, match="bad sort"):
        parse_query("x sort:nope")


def test_boost_clause(setup):
    from fulltextsearchengine_spark.operators.queryparse import execute_query, parse_query

    golden, searcher, _, doc_tokens = setup
    q_terms = ["aa", "db", "fh"]
    pq = parse_query("aa^2.5 db fh")
    assert pq.boosts == {"aa": 2.5} and pq.terms == q_terms
    got = [
        (r["doc_id"], r["score"])
        for r in execute_query(searcher, "aa^2.5 db fh", k=10**6).collect()
    ]
    # brute: per-term weighted BM25 sum (weight folded into idf)
    import math

    n = golden["num_docs"]
    avgdl = golden["total_tokens"] / n
    dfm = golden["term_to_document_frequency"]
    w_of = {"aa": 2.5, "db": 1.0, "fh": 1.0}
    exp_scores = {}
    for t in q_terms:
        df = dfm.get(t, 0)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        flat = golden["term_to_postings"][t]
        for d, tf in zip(flat[::2], flat[1::2]):
            dl = golden["doc_to_length"][d]
            c = w_of[t] * idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
            exp_scores[d] = exp_scores.get(d, 0.0) + c
    exp = sorted(exp_scores.items(), key=lambda x: (-x[1], x[0]))
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (_, es), (_, gs) in zip(exp, got):
        assert gs == pytest.approx(es, rel=1e-9)
    # boost of 1.0 everywhere == plain path (exact float identity:
    # 1.0*idf multiplies to the same double)
    plain = [
        (r["doc_id"], r["score"])
        for r in execute_query(searcher, "aa db fh", k=10**6).collect()
    ]
    boosted1 = [
        (r["doc_id"], r["score"])
        for r in execute_query(searcher, "aa^1 db fh", k=10**6).collect()
    ]
    assert boosted1 == plain
    # composes with mm
    got_mm = {
        r["doc_id"]
        for r in execute_query(searcher, "aa^2.5 db fh mm:2", k=10**6).collect()
    }
    matched = {
        d: sum(t in set(toks) for t in q_terms) for d, toks in doc_tokens.items()
    }
    assert got_mm == {d for d in exp_scores if matched[d] >= 2}
    with pytest.raises(ValueError, match="bad boost"):
        parse_query("aa^0 db")
