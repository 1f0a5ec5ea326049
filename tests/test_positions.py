"""Positional postings + phrase search vs brute-force python over the
tokenized golden corpus."""

from __future__ import annotations

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.positions import (
    build_positional_postings,
    phrase_search,
)
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    docs = oracle.assign_doc_ids(small_transcripts_pdf)
    doc_tokens = {
        row.doc_id: oracle.tokenize(row.text) for row in docs.itertuples(index=False)
    }
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    pos = build_positional_postings(sdf).cache()
    return doc_tokens, pos


def test_positional_postings_match_token_stream(setup):
    doc_tokens, pos = setup
    exp: dict[tuple[str, int], list[int]] = {}
    for d, toks in doc_tokens.items():
        for i, t in enumerate(toks, 1):
            exp.setdefault((t, d), []).append(i)
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["positions"]) for r in pos.collect()
    }
    assert set(got) == set(exp)
    for key, plist in exp.items():
        assert got[key] == (len(plist), plist)


def _brute_phrase(doc_tokens: dict, phrase: list[str]) -> list[tuple[int, int]]:
    n = len(phrase)
    out = []
    for d, toks in doc_tokens.items():
        c = sum(
            1
            for i in range(len(toks) - n + 1)
            if toks[i : i + n] == phrase
        )
        if c:
            out.append((d, c))
    return sorted(out, key=lambda x: (-x[1], x[0]))


def test_phrase_search_vs_bruteforce(setup):
    doc_tokens, pos = setup
    # pick real bigrams/trigrams from the corpus plus a repeated-term
    # phrase and a no-hit phrase
    some = next(toks for toks in doc_tokens.values() if len(toks) >= 3)
    bigram = list(some[0:2])
    trigram = list(some[0:3])
    for phrase in [bigram, trigram, [bigram[0], bigram[0]], ["zzz", "qqq"]]:
        exp = _brute_phrase(doc_tokens, phrase)[:10]
        got = [
            (r["doc_id"], r["phrase_tf"])
            for r in phrase_search(pos, phrase, k=10).collect()
        ]
        assert got == exp, phrase


def test_phrase_search_repeated_term_overlap(spark):
    # "a a" in "a a a" matches at positions 1 and 2
    pdf_rows = [("c1", 0, "user", "a a a b a a", None, None)]
    sdf = spark.createDataFrame(pdf_rows, schema=TRANSCRIPT_SCHEMA)
    pos = build_positional_postings(sdf)
    got = phrase_search(pos, ["a", "a"], k=5).collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in got] == [(1, 3)]
    with pytest.raises(ValueError):
        phrase_search(pos, [])


def test_saved_positional_layout_prunes(setup, spark, tmp_path_factory):
    from fulltextsearchengine_spark.operators.positions import (
        load_positional_postings,
        save_positional_postings,
    )

    doc_tokens, pos = setup
    path = str(tmp_path_factory.mktemp("posidx") / "pospostings")
    save_positional_postings(pos, path)
    loaded = load_positional_postings(spark, path)
    # round-trip identity
    assert sorted(map(tuple, loaded.collect()), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, pos.collect()), key=lambda t: (t[0], t[1])
    )
    # phrase over the persisted table: pushed In(term) filter + same result
    some = next(t for t in doc_tokens.values() if len(t) >= 2)
    got_df = phrase_search(loaded, some[:2], k=10)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan.split("PushedFilters", 1)[1][:300]
    assert [tuple(r) for r in got_df.collect()] == [
        tuple(r) for r in phrase_search(pos, some[:2], k=10).collect()
    ]


def _brute_min_window(toks: list[str], terms: set[str]) -> int | None:
    best = None
    for i, t in enumerate(toks):
        if t not in terms:
            continue
        seen = set()
        for j in range(i, len(toks)):
            if toks[j] in terms:
                seen.add(toks[j])
                if seen == terms:
                    span = j - i + 1
                    best = span if best is None else min(best, span)
                    break
    return best


def test_min_window_spans_vs_bruteforce(setup):
    from fulltextsearchengine_spark.operators.positions import min_window_spans

    doc_tokens, pos = setup
    for terms in (["table", "hash"], ["table", "hash", "scan"], ["merge"]):
        tset = set(terms)
        expected = {
            d: _brute_min_window(toks, tset)
            for d, toks in doc_tokens.items()
        }
        expected = {d: s for d, s in expected.items() if s is not None}
        got = {
            r["doc_id"]: r["min_span"]
            for r in min_window_spans(pos, terms).collect()
        }
        assert got == expected, terms


def test_unordered_window_search_semantics(spark):
    from fulltextsearchengine_spark.operators.positions import (
        build_positional_postings,
        unordered_window_search,
    )
    from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    import datetime as dt
    import pandas as pd

    rows = [
        # doc 0: adjacent reversed ("hash table") -> span 2
        ("c0", 0, "user", "the hash table wins", None, dt.datetime(2026, 1, 1)),
        # doc 1: one filler between -> span 3
        ("c0", 1, "user", "table of hash", None, dt.datetime(2026, 1, 1)),
        # doc 2: only one term -> never matches
        ("c0", 2, "user", "table table table", None, dt.datetime(2026, 1, 1)),
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        schema=TRANSCRIPT_SCHEMA,
    )
    pos = build_positional_postings(sdf)
    # docIDs are the dense 1-based (conv_id, turn_idx) assignment
    # slop=0: consecutive in SOME order -> the "hash table" doc only
    assert [r["doc_id"] for r in unordered_window_search(pos, ["table", "hash"], 0).collect()] == [1]
    # slop=1 admits the one-filler doc, tightest first
    got = unordered_window_search(pos, ["table", "hash"], 1).collect()
    assert [(r["doc_id"], r["min_span"]) for r in got] == [(1, 2), (2, 3)]
    import pytest as _pt

    with _pt.raises(ValueError):
        unordered_window_search(pos, ["table"], -1)


def test_ordered_window_spans_vs_bruteforce(setup):
    from fulltextsearchengine_spark.operators.positions import ordered_window_spans

    doc_tokens, pos = setup
    for terms in (["table", "hash"], ["hash", "table"], ["table", "hash", "scan"]):
        expected = {}
        for d, toks in doc_tokens.items():
            # greedy-from-each-start is NOT always globally minimal for
            # the brute force; use exhaustive minimal ordered chain
            best = None
            import itertools
            poss = [[i + 1 for i, t in enumerate(toks) if t == q] for q in terms]
            if all(poss):
                def rec(slot, prev):
                    if slot == len(terms):
                        return prev
                    for p in poss[slot]:
                        if p > prev:
                            return rec(slot + 1, p)
                    return None
                for start in poss[0]:
                    end = rec(1, start)
                    if end is not None:
                        span = end - start + 1
                        best = span if best is None else min(best, span)
            if best is not None:
                expected[d] = best
        got = {
            r["doc_id"]: r["min_span"]
            for r in ordered_window_spans(pos, terms).collect()
        }
        assert got == expected, terms


def test_ordered_window_guards(setup):
    from fulltextsearchengine_spark.operators.positions import (
        ordered_window_search,
        ordered_window_spans,
    )

    _, pos = setup
    with pytest.raises(ValueError):
        ordered_window_spans(pos, ["table", "table"])
    with pytest.raises(ValueError):
        ordered_window_search(pos, ["table", "hash"], -1)


def test_ordered_window_crafted_backreference(spark):
    # doc where the globally-smallest continuation PRECEDES the start:
    # a correct ordered chain must skip it ("hash x table hash")
    from fulltextsearchengine_spark.operators.positions import (
        build_positional_postings,
        ordered_window_spans,
    )
    from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    import datetime as dt
    import pandas as pd

    rows = [("c0", 0, "user", "hash x table hash", None, dt.datetime(2026, 1, 1))]
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        schema=TRANSCRIPT_SCHEMA,
    )
    pos = build_positional_postings(sdf)
    got = ordered_window_spans(pos, ["table", "hash"]).collect()
    assert [(r["doc_id"], r["min_span"]) for r in got] == [(1, 2)]
