"""Bigram stupid-backoff LM: Spark training/scoring vs a pure-python
reimplementation, plus the CCNet-style filter contract."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

import pytest

from fulltextsearchengine_spark.functions.tokenize import tokenize_texts
from fulltextsearchengine_spark.operators.ngram_lm import (
    STUPID_BACKOFF_ALPHA,
    bigram_xent,
    perplexity_filter,
    train_bigram_lm,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox sleeps"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the dog jumps over the quick fox again and again"),
    (4, "sphinx of black quartz judge my vow"),
    (5, "zzz unseen-token zzz unseen zzz"),  # OOV-heavy under train slice
    (6, ""),  # token-less
    (7, "THE Quick BROWN fox"),  # case folding
]
TRAIN_IDS = [0, 2, 4]  # doc_id % 2 == 0 (and not the empty doc)


def _py_lm(texts):
    uni, big = Counter(), Counter()
    for t in texts:
        toks = tokenize_texts(pd.Series([t])).iloc[0]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    return uni, big, sum(uni.values()), len(uni)


def _py_xent(text, uni, big, n, v, alpha=STUPID_BACKOFF_ALPHA):
    toks = tokenize_texts(pd.Series([text])).iloc[0]
    if not toks:
        return 0, 0, 0
    nll = 0.0
    for i, cur in enumerate(toks):
        s_uni = (uni.get(cur, 0) + 1) / (n + v + 1)
        if i == 0:
            s = s_uni
        elif (toks[i - 1], cur) in big:
            s = big[(toks[i - 1], cur)] / uni[toks[i - 1]]
        else:
            s = alpha * s_uni
        nll += -math.log(s)
    k = len(toks)
    xent_micro = round(nll / k * 1e6)
    return k, xent_micro, round(math.exp(xent_micro / 1e6) * 1e6)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


@pytest.fixture(scope="module")
def lm(corpus):
    return train_bigram_lm(corpus.filter("doc_id % 2 = 0 AND doc_id < 5"))


def test_train_counts_match_python(lm):
    uni, big, n, v = _py_lm([t for i, t in DOCS if i in TRAIN_IDS])
    assert {(r["term"], r["c"]) for r in lm.unigrams.collect()} == {
        (t, c) for t, c in uni.items()
    }
    assert {(r["w1"], r["w2"], r["c"]) for r in lm.bigrams.collect()} == {
        (a, b, c) for (a, b), c in big.items()
    }
    assert (lm.total_tokens, lm.vocab_size) == (n, v)


def test_xent_matches_python_incl_oov_and_empty(corpus, lm):
    uni, big, n, v = _py_lm([t for i, t in DOCS if i in TRAIN_IDS])
    expected = {i: _py_xent(t, uni, big, n, v) for i, t in DOCS}
    got = {
        r["doc_id"]: (r["n_tokens"], r["xent_micro"], r["ppl_micro"])
        for r in bigram_xent(corpus, lm).collect()
    }
    assert got == expected
    assert got[6] == (0, 0, 0)  # empty doc contract
    # OOV-heavy doc must be strictly worse than an in-train doc
    assert got[5][1] > got[0][1]


def test_case_folding_scores_like_lowercase(corpus, lm):
    got = {r["doc_id"]: r["xent_micro"] for r in bigram_xent(corpus, lm).collect()}
    spark = corpus.sparkSession
    lower = spark.createDataFrame([(7, "the quick brown fox")], ["doc_id", "text"])
    assert got[7] == bigram_xent(lower, lm).collect()[0]["xent_micro"]


def test_min_count_prunes_bigrams_only(corpus):
    full = train_bigram_lm(corpus.filter("doc_id % 2 = 0 AND doc_id < 5"))
    pruned = train_bigram_lm(
        corpus.filter("doc_id % 2 = 0 AND doc_id < 5"), min_count=2
    )
    assert pruned.bigrams.count() < full.bigrams.count()
    assert (pruned.total_tokens, pruned.vocab_size) == (
        full.total_tokens,
        full.vocab_size,
    )
    # pruned model backs off more -> xent never decreases
    fx = {r["doc_id"]: r["xent_micro"] for r in bigram_xent(corpus, full).collect()}
    px = {r["doc_id"]: r["xent_micro"] for r in bigram_xent(corpus, pruned).collect()}
    assert all(px[i] >= fx[i] for i in fx)


def test_perplexity_filter_threshold(corpus, lm):
    x = {r["doc_id"]: r["xent_micro"] for r in bigram_xent(corpus, lm).collect()}
    cut = sorted(x.values())[len(x) // 2]
    kept = {r["doc_id"] for r in perplexity_filter(corpus, lm, cut).collect()}
    assert kept == {i for i, v in x.items() if v <= cut}
    assert 6 in kept  # token-less doc scores 0 and passes (documented)


def test_perplexity_buckets(corpus, lm):
    from fulltextsearchengine_spark.operators.ngram_lm import perplexity_buckets

    x = {r["doc_id"]: r["xent_micro"] for r in bigram_xent(corpus, lm).collect()}
    for m in (2, 3):
        got = {
            r["doc_id"]: r["bucket"]
            for r in perplexity_buckets(corpus, lm, n_buckets=m).collect()
        }
        # python twin: value-threshold boundaries at ceil(k*n/m) cum counts
        vals = sorted(x.values())
        n = len(vals)
        bounds = []
        for k in range(1, m):
            need = -(-k * n // m)
            bounds.append(vals[need - 1])
        expected = {
            d: 1 + sum(v > b for b in bounds) for d, v in x.items()
        }
        assert got == expected, m
        assert set(got.values()) <= set(range(1, m + 1))
        # head bucket holds the lowest-xent doc, tail the highest
        lo = min(x, key=lambda d: (x[d], d)); hi = max(x, key=lambda d: (x[d], d))
        assert got[lo] == 1 and got[hi] == m
    import pytest as _pt

    with _pt.raises(ValueError):
        perplexity_buckets(corpus, lm, n_buckets=1)
