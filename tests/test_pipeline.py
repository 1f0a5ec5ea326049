"""Composed cleaning pipeline (operators/pipeline): filter stages,
first-wins dedup, report/budget aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        # survives everything
        (1, "the quick brown fox jumps over the lazy dog and then the fox rests "
            "in the shade of a tall green tree for a while today"),
        # exact canonical dup of doc 1 (case/punct differences only)
        (2, "THE quick BROWN fox jumps over the lazy dog -- and then the fox rests "
            "in the shade of a tall green tree, for a while today!"),
        # too short
        (3, "the short one is dropped"),
        # low uniqueness (repeated token spam)
        (4, " ".join(["the spam"] * 30)),
        # not English (no stopword hits)
        (5, "zzz qqq www rrr ttt yyy uuu iii ooo ppp aaa sss ddd fff ggg hhh "
            "jjj kkk lll mmm nnn bbb vvv ccc xxx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_stages(spark):
    from fulltextsearchengine_spark.operators.pipeline import clean_corpus

    out = clean_corpus(_docs(spark)).select("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1]  # dup 2 dropped (first wins), 3-5 filtered


def test_corpus_report_and_budget(spark):
    from fulltextsearchengine_spark.operators.pipeline import (
        clean_corpus,
        corpus_report,
        token_budget,
    )

    rep = corpus_report(clean_corpus(_docs(spark))).collect()
    assert len(rep) == 1 and rep[0]["lang_pred"] == "en" and rep[0]["n_docs"] == 1

    bud = token_budget(_docs(spark)).collect()[0]
    assert bud["n_docs"] == 5
    # doc 2's "--" is a whitespace token but not an alnum token
    assert bud["ws_tokens"] == bud["alnum_tokens"] + 1
    assert bud["chars"] > bud["ws_tokens"]


def test_clean_corpus_single_scan_no_python(spark):
    # the filter stages must fuse into the scan: no BatchEvalPython, no
    # extra Exchange before the dedup window
    from fulltextsearchengine_spark.operators.pipeline import clean_corpus

    plan = clean_corpus(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # dedup window partitioning (+AQE variant)


def test_curation_funnel_stages(spark):
    from fulltextsearchengine_spark.operators.ngram_lm import bigram_xent, train_bigram_lm
    from fulltextsearchengine_spark.operators.pipeline import curation_funnel

    docs = spark.createDataFrame(
        [
            (0, "xx yy"),  # fails quality (min_tokens=3)
            (1, "el la de que y en los"),  # fails language (es)
            (2, "the cat and the dog in a field"),
            (3, "the cat and the dog in a field"),  # exact dup of 2
            (4, "the quick fox is that it for with a"),
            (5, "the zzz qqq vvv www of to in is"),
        ],
        "doc_id long, text string",
    )
    lm = train_bigram_lm(docs.filter("doc_id IN (2, 4)"))
    got = {
        r["stage"]: (r["stage_idx"], r["n_in"], r["n_out"])
        for r in curation_funnel(
            docs, lm, min_tokens=3, min_uniq_ratio_micro=0,
            max_punct_ratio_micro=1_000_000,
        ).collect()
    }
    assert got["quality"] == (1, 6, 5)
    assert got["language"] == (2, 5, 4)
    assert got["exact_dedup"] == (3, 4, 3)
    # stage 4 expectation from the (already parity-tested) xent op +
    # the integer below-mean rule
    x = {
        r["doc_id"]: r["xent_micro"]
        for r in bigram_xent(docs, lm).collect()
        if r["doc_id"] in (2, 4, 5)
    }
    n4 = sum(1 for v in x.values() if v * len(x) <= sum(x.values()))
    assert got["lm_ppl"] == (4, 3, n4)
    assert 0 < n4 < 3  # the rule actually bites on this corpus
