"""Nested boolean retrieval vs a brute-force Python evaluator."""

from __future__ import annotations

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.boolquery import (
    And,
    Not,
    Or,
    Term,
    bool_search,
    parse_bool,
)
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

K = 10


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    docs = oracle.assign_doc_ids(small_transcripts_pdf)
    doc_tokens = {
        r.doc_id: set(oracle.tokenize(r.text)) for r in docs.itertuples(index=False)
    }
    return golden, Searcher(build_index(sdf)), doc_tokens


def test_parse_bool_shapes():
    assert parse_bool("a b") == And((Term("a"), Term("b")))  # adjacency = AND
    assert parse_bool("a OR b AND c") == Or((Term("a"), And((Term("b"), Term("c")))))
    assert parse_bool("(a OR b) AND -c") == And(
        (Or((Term("a"), Term("b"))), Not(Term("c")))
    )
    assert parse_bool("NOT a AND b") == And((Not(Term("a")), Term("b")))
    # lowercase 'or' is a term, not an operator
    assert parse_bool("a or") == And((Term("a"), Term("or")))
    # multi-token word = implicit AND of its folded tokens
    assert parse_bool("a-b") == And((Term("a"), Term("b")))
    for bad in ("(a", "a)", "a OR", "AND a"):
        with pytest.raises(ValueError):
            parse_bool(bad)
    with pytest.raises(ValueError, match="proximity"):
        parse_bool('"a b"~2')


def _brute(golden, doc_tokens, tree, k):
    def ev(n, toks):
        if isinstance(n, Term):
            return n.t in toks
        if isinstance(n, Not):
            return not ev(n.kid, toks)
        if isinstance(n, And):
            return all(ev(x, toks) for x in n.kids)
        return any(ev(x, toks) for x in n.kids)

    pos: set = set()

    def collect(n, neg):
        if isinstance(n, Term):
            if not neg:
                pos.add(n.t)
        elif isinstance(n, Not):
            collect(n.kid, not neg)
        else:
            for x in n.kids:
                collect(x, neg)

    collect(tree, False)
    score_terms = sorted(t for t in pos if golden["term_to_document_frequency"].get(t))
    matched = {d for d, toks in doc_tokens.items() if ev(tree, toks)}
    scored = [
        (d, s)
        for d, s in oracle.bm25_search(golden, score_terms, golden["num_docs"])
        if d in matched
    ]
    return sorted(scored, key=lambda x: (-x[1], x[0]))[:k]


def test_bool_search_rank_identity(setup):
    golden, searcher, doc_tokens = setup
    by_df = sorted(
        golden["term_to_document_frequency"].items(), key=lambda kv: (-kv[1], kv[0])
    )
    # high-df terms co-occur, so the boolean structure has data to bite on
    a, b, c, d = (t for t, _ in by_df[:4])
    queries = [
        f"({a} OR {b}) AND {c}",
        f"{a} OR ({b} AND {c})",
        f"({a} OR {b}) AND NOT {c}",
        f"{a} AND ({b} OR {c} OR {d}) AND -{b}",
        f"(({a} OR {b}) AND ({c} OR {d})) OR ({a} AND {d})",
    ]
    for q in queries:
        tree = parse_bool(q)
        exp = _brute(golden, doc_tokens, tree, K)
        got = [
            (r["doc_id"], r["score"]) for r in bool_search(searcher, q, K).collect()
        ]
        assert [g[0] for g in got] == [e[0] for e in exp], q
        for (_, es), (_, gs) in zip(exp, got):
            assert gs == pytest.approx(es, rel=1e-9)
        assert exp, q  # high-df fixture terms guarantee matches


def test_bool_search_oov_and_grounding(setup):
    golden, searcher, doc_tokens = setup
    ts = sorted(golden["term_to_document_frequency"])
    a, b = ts[0], ts[len(ts) // 2]
    # OOV positive leaf folds away inside OR; NOT oov folds to True
    q = f"({a} OR zzznotaterm) AND NOT qqqnotaterm"
    exp = _brute(golden, doc_tokens, parse_bool(f"{a}"), K)
    got = [(r["doc_id"], r["score"]) for r in bool_search(searcher, q, K).collect()]
    assert [g[0] for g in got] == [e[0] for e in exp]
    # an AND with an OOV mandatory leaf matches nothing
    assert bool_search(searcher, f"{a} AND zzznotaterm", K).count() == 0
    # ungrounded trees are rejected
    for bad in ("NOT x", f"{a} OR NOT {b}", f"NOT {a} OR NOT {b}"):
        with pytest.raises(ValueError, match="grounded"):
            bool_search(searcher, bad, K)
    # grounded: negation beside a positive sibling inside AND is fine
    bool_search(searcher, f"{a} AND NOT {b}", K).collect()


def test_bool_filter_corpus(setup, spark, small_transcripts_pdf):
    from fulltextsearchengine_spark.operators.boolquery import bool_filter_corpus
    from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    golden, _, doc_tokens = setup
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    docs = oracle.assign_doc_ids(small_transcripts_pdf)
    text_of = {r.doc_id: r.text for r in docs.itertuples(index=False)}
    by_df = sorted(
        golden["term_to_document_frequency"].items(), key=lambda kv: (-kv[1], kv[0])
    )
    a, b, c = (t for t, _ in by_df[:3])
    q = f"({a} OR {b}) AND NOT {c}"
    tree = parse_bool(q)

    def ev(n, toks):
        if isinstance(n, Term):
            return n.t in toks
        if isinstance(n, Not):
            return not ev(n.kid, toks)
        if isinstance(n, And):
            return all(ev(x, toks) for x in n.kids)
        return any(ev(x, toks) for x in n.kids)

    got = {r["text"] for r in bool_filter_corpus(sdf, q).collect()}
    exp = {text_of[d] for d, toks in doc_tokens.items() if ev(tree, toks)}
    assert got == exp and exp
    # pure negation is legal on the corpus-scan path
    got_neg = bool_filter_corpus(sdf, f"NOT {a}").count()
    exp_neg = sum(1 for toks in doc_tokens.values() if a not in toks)
    assert got_neg == exp_neg
    # all columns survive (filter-operator convention)
    assert set(bool_filter_corpus(sdf, q).columns) == set(sdf.columns)


def test_bool_search_phrases(setup, spark, small_transcripts_pdf):
    from fulltextsearchengine_spark.operators.boolquery import Phrase
    from fulltextsearchengine_spark.operators.positions import build_positional_postings
    from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    golden, searcher, _ = setup
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    pos = build_positional_postings(sdf).cache()
    docs = oracle.assign_doc_ids(small_transcripts_pdf)
    doc_toklists = {
        r.doc_id: oracle.tokenize(r.text) for r in docs.itertuples(index=False)
    }
    # pick a phrase that actually occurs: the first bigram of some doc
    some = next(d for d, t in sorted(doc_toklists.items()) if len(t) >= 2)
    w1, w2 = doc_toklists[some][0], doc_toklists[some][1]
    by_df = sorted(
        golden["term_to_document_frequency"].items(), key=lambda kv: (-kv[1], kv[0])
    )
    a, b = (t for t, _ in by_df[:2])

    def has_phrase(toks):
        return any(
            toks[i] == w1 and toks[i + 1] == w2 for i in range(len(toks) - 1)
        )

    q = f'("{w1} {w2}" OR {a}) AND NOT {b}'
    tree = parse_bool(q)
    assert Phrase((w1, w2)) in tree.kids[0].kids

    def ev(d):
        toks = doc_toklists[d]
        ts = set(toks)
        return (has_phrase(toks) or a in ts) and b not in ts

    matched = {d for d in doc_toklists if ev(d)}
    score_terms = sorted({w1, w2, a})
    exp = [
        (d, s)
        for d, s in oracle.bm25_search(golden, score_terms, golden["num_docs"])
        if d in matched
    ]
    exp = sorted(exp, key=lambda x: (-x[1], x[0]))[:K]
    got = [
        (r["doc_id"], r["score"])
        for r in bool_search(searcher, q, K, pos_postings=pos).collect()
    ]
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (_, es), (_, gs) in zip(exp, got):
        assert gs == pytest.approx(es, rel=1e-9)
    assert exp
    # negated phrase composes; grounded by the positive term
    q2 = f'{a} AND NOT "{w1} {w2}"'
    got2 = {r["doc_id"] for r in bool_search(searcher, q2, 10**6, pos_postings=pos).collect()}
    exp2 = {
        d for d, t in doc_toklists.items() if a in set(t) and not has_phrase(t)
    }
    assert got2 == exp2
    # phrase without the side-table raises; OOV-token phrase folds to False
    with pytest.raises(ValueError, match="positional"):
        bool_search(searcher, q, K)
    assert bool_search(
        searcher, f'"{w1} zzznotaterm" AND {a}', K, pos_postings=pos
    ).count() == 0
