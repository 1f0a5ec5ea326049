"""Multi-term queries (wildcard / fuzzy / regex expansion → BM25) and
their search-box grammar forms, vs brute-force expansion over the
golden corpus vocabulary + the python BM25 oracle."""

from __future__ import annotations

import re

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.multiterm import (
    expand_fuzzy,
    expand_regex,
    expand_wildcard,
    fuzzy_search,
    regex_search,
    regex_term_lookup,
    wildcard_search,
)
from fulltextsearchengine_spark.operators.queryparse import execute_query, parse_query
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

K = 10


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    return golden, Searcher(build_index(sdf))


def _vocab_cf(golden) -> dict[str, int]:
    return {
        t: sum(flat[1::2])
        for t, flat in golden["term_to_postings"].items()
    }


def _top_by_cf(matches: list[str], cf: dict[str, int], n: int) -> list[str]:
    ranked = sorted(matches, key=lambda t: (-cf[t], t))[:n]
    return sorted(ranked)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------- expansion


def test_expansions_match_bruteforce(setup):
    golden, searcher = setup
    cf = _vocab_cf(golden)
    # wildcard a* — prefix form
    exp = expand_wildcard(searcher, "a*", max_expansions=8)
    brute = _top_by_cf([t for t in cf if t.startswith("a")], cf, 8)
    assert exp == brute
    # infix wildcard *h* via trigram/LIKE fallback path
    exp = expand_wildcard(searcher, "*h*", max_expansions=8)
    brute = _top_by_cf([t for t in cf if "h" in t], cf, 8)
    assert exp == brute
    # regex full-match: two-char terms starting with a or d
    exp = expand_regex(searcher, "[ad].", max_expansions=50)
    brute = _top_by_cf(
        [t for t in cf if re.fullmatch(r"[ad].", t)], cf, 50
    )
    assert exp == brute
    # regex is FULL match — 'a.' must not match 3-char terms
    assert all(len(t) == 2 for t in exp)


def test_regex_term_lookup_orders_by_cf(setup):
    golden, searcher = setup
    cf = _vocab_cf(golden)
    rows = regex_term_lookup(searcher.index.terms, "a.*", k=5).collect()
    got = [(r["term"], r["cf"]) for r in rows]
    brute = sorted(
        ((t, cf[t]) for t in cf if t.startswith("a")),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert got == brute


def test_fuzzy_expansion_is_edit1_neighborhood(setup):
    golden, searcher = setup
    cf = _vocab_cf(golden)
    base = sorted(cf)[0]
    typo = base[:-1] + "zz"[:1]  # substitute last char with 'z'
    exp = expand_fuzzy(searcher, typo, max_expansions=200)
    brute = sorted(t for t in cf if _lev(t, typo) <= 1)
    assert exp == brute and base in exp


# ---------------------------------------------------------------- scoring


def test_wildcard_search_rank_identity(setup):
    golden, searcher = setup
    cf = _vocab_cf(golden)
    exp_terms = _top_by_cf([t for t in cf if t.startswith("a")], cf, 50)
    want = oracle.bm25_search(golden, exp_terms + ["db"], K)
    got = [
        (r["doc_id"], r["score"])
        for r in wildcard_search(
            searcher, "a*", K, literal_terms=["db"]
        ).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, ws), (_, gs) in zip(want, got):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_fuzzy_and_regex_search(setup):
    golden, searcher = setup
    cf = _vocab_cf(golden)
    base = sorted(cf)[0]
    typo = base[:-1] + "z"
    nbhd = sorted(t for t in cf if _lev(t, typo) <= 1)
    want = oracle.bm25_search(golden, nbhd, K)
    got = [(r["doc_id"], r["score"]) for r in fuzzy_search(searcher, typo, K).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]

    pat = "[ad]."
    terms = _top_by_cf([t for t in cf if re.fullmatch(pat, t)], cf, 50)
    want = oracle.bm25_search(golden, terms, K)
    got = [(r["doc_id"], r["score"]) for r in regex_search(searcher, pat, K).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]


def test_empty_expansion_matches_nothing(setup):
    _, searcher = setup
    assert wildcard_search(searcher, "zzzzqqq*", K).count() == 0
    assert regex_search(searcher, "zz+q", K).count() == 0


# ---------------------------------------------------------------- grammar


def test_parse_multiterm_clauses():
    pq = parse_query('qu* sparc~ sparc~1 /a.b/ -te*m -typo~ -/x+/ w*ld^2 join')
    assert pq.wildcards == ["qu*", "w*ld"]
    assert pq.excluded_wildcards == ["te*m"]
    assert pq.fuzzies == ["sparc", "sparc"]
    assert pq.excluded_fuzzies == ["typo"]
    assert pq.regexes == ["a.b"]
    assert pq.excluded_regexes == ["x+"]
    assert pq.pattern_boosts == {"w:w*ld": 2.0}
    assert pq.terms == ["join"]
    with pytest.raises(ValueError):  # distance-2 unsupported
        parse_query("term~2")
    with pytest.raises(ValueError):  # no literal char
        parse_query("**")
    with pytest.raises(ValueError):  # non-alnum wildcard chars
        parse_query("a?b*")


def test_execute_query_multiterm(setup):
    golden, searcher = setup
    cf = _vocab_cf(golden)
    exp_terms = _top_by_cf([t for t in cf if t.startswith("a")], cf, 50)
    want = oracle.bm25_search(golden, exp_terms + ["db"], K)
    got = [
        (r["doc_id"], r["score"])
        for r in execute_query(searcher, "a* db", k=K).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, ws), (_, gs) in zip(want, got):
        assert gs == pytest.approx(ws, rel=1e-9)

    # negated wildcard: no surviving doc contains any a* term
    res = execute_query(searcher, "db -a*", k=10**6).collect()
    bad_docs = {
        d for t in cf if t.startswith("a")
        for d in oracle._postings_map(golden, t)
    }
    assert res and all(r["doc_id"] not in bad_docs for r in res)

    # boosted wildcard == the explicit boosted-term query it rewrites to
    explicit = " ".join(f"{t}^2" for t in exp_terms) + " db"
    want2 = execute_query(searcher, explicit, k=K).collect()
    got2 = execute_query(searcher, "a*^2 db", k=K).collect()
    assert [(r["doc_id"], r["score"]) for r in got2] == [
        (r["doc_id"], r["score"]) for r in want2
    ]

    # all-pattern query expanding to nothing: empty result, not an error
    assert execute_query(searcher, "zzqq*", k=K).count() == 0
    with pytest.raises(ValueError):  # still no positive clause at all
        execute_query(searcher, "-noise", k=K)


def test_execute_query_uses_persisted_sidecars(setup):
    from fulltextsearchengine_spark.operators.lexicon import (
        build_fuzzy_index,
        build_trigram_index,
    )

    golden, searcher = setup
    cf = _vocab_cf(golden)
    base = sorted(cf)[0]
    typo = base[:-1] + "z"
    tri = build_trigram_index(searcher.index.terms).cache()
    fz = build_fuzzy_index(searcher.index.terms).cache()
    q = f"a* {typo}~ db"
    with_side = execute_query(
        searcher, q, k=K, trigram_index=tri, fuzzy_index=fz
    ).collect()
    without = execute_query(searcher, q, k=K).collect()
    assert [(r["doc_id"], r["score"]) for r in with_side] == [
        (r["doc_id"], r["score"]) for r in without
    ]
    tri.unpersist()
    fz.unpersist()
