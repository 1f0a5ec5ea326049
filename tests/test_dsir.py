"""DSIR hashed-ngram importance resampling vs a pure-python
reimplementation: features, fit, weights (incl. OOV buckets), and the
deterministic Gumbel top-k sample."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest

from fulltextsearchengine_spark.functions.tokenize import tokenize_texts
from fulltextsearchengine_spark.operators.dsir import (
    dsir_fit,
    dsir_log_weights,
    dsir_resample,
    hashed_ngram_features,
)

B = 53  # prime, small enough to force collisions

RAW = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "el zorro marron salta sobre el perro perezoso"),
    (2, "the dog sleeps while the fox runs through the field"),
    (3, "la casa azul tiene una puerta verde y grande"),
    (4, "a quick clever fox outfoxes a slow dog"),
    (5, ""),
    (6, "completely novel words zyzzyva qwertyuiop asdfghjkl"),
]
TARGET_IDS = {0, 2, 4}  # the "english" target slice


def _toks(t):
    return list(tokenize_texts(pd.Series([t])).iloc[0])


def _grams(t):
    toks = _toks(t)
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _py_feats(t):
    return Counter(_bucket(g) for g in _grams(t))


def _py_fit():
    tc, rc = Counter(), Counter()
    for i, t in RAW:
        f = _py_feats(t)
        rc.update(f)
        if i in TARGET_IDS:
            tc.update(f)
    T, R = sum(tc.values()), sum(rc.values())
    lam = {
        b: math.log((tc.get(b, 0) + 1) / (T + B)) - math.log((rc.get(b, 0) + 1) / (R + B))
        for b in set(tc) | set(rc)
    }
    return tc, rc, T, R, lam


def _py_logw(t, lam, T, R):
    oov = math.log((R + B) / (T + B))
    f = _py_feats(t)
    return sum(f.values()), sum(c * lam.get(b, oov) for b, c in f.items())


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(RAW, ["doc_id", "text"]).cache()


@pytest.fixture(scope="module")
def fit(raw_df):
    return dsir_fit(
        raw_df, raw_df.filter("doc_id % 2 = 0 AND doc_id < 5"), n_buckets=B
    ).cache()


def test_features_match_python(raw_df):
    got = {
        (r["doc_id"], r["bucket"]): r["c"]
        for r in hashed_ngram_features(raw_df, n_buckets=B).collect()
    }
    expected = {
        (i, b): c for i, t in RAW for b, c in _py_feats(t).items()
    }
    assert got == expected


def test_fit_matches_python(fit):
    tc, rc, T, R, lam = _py_fit()
    rows = fit.collect()
    assert {r["bucket"] for r in rows} == set(lam)
    for r in rows:
        assert r["target_c"] == tc.get(r["bucket"], 0)
        assert r["raw_c"] == rc.get(r["bucket"], 0)
        assert r["log_ratio"] == pytest.approx(lam[r["bucket"]], abs=1e-12)


def test_log_weights_match_python_incl_oov(spark, raw_df, fit):
    tc, rc, T, R, lam = _py_fit()
    # score the raw corpus PLUS a doc with grams the fit never saw
    extra = spark.createDataFrame(
        [(99, "xylophone quixotic jackdaws vex the zebra")], ["doc_id", "text"]
    )
    scored = raw_df.unionByName(extra)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw_micro"])
        for r in dsir_log_weights(scored, fit, n_buckets=B).collect()
    }
    for i, t in RAW + [(99, "xylophone quixotic jackdaws vex the zebra")]:
        n, logw = _py_logw(t, lam, T, R)
        assert got[i] == (n, round(logw * 1e6)), f"doc {i}"
    assert got[5] == (0, 0)  # feature-less doc
    # target-slice docs must outweigh the spanish docs under an en target
    assert got[0][1] > got[1][1] and got[2][1] > got[3][1]


def test_resample_deterministic_and_matches_python(raw_df, fit):
    tc, rc, T, R, lam = _py_fit()

    def key(i, t, seed):
        _, logw = _py_logw(t, lam, T, R)
        h = int(
            hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:13], 16
        )
        u = (h + 0.5) / 2**52
        return round((round(logw * 1e6) / 1e6 + -math.log(-math.log(u))) * 1e6)

    for seed in (7, 42):
        expected = sorted(
            ((key(i, t, seed), -i) for i, t in RAW), reverse=True
        )[:3]
        expected_ids = [-neg for _, neg in expected]
        got = dsir_resample(raw_df, fit, n=3, seed=seed, n_buckets=B).collect()
        assert [r["doc_id"] for r in got] == expected_ids
        assert [r["key_micro"] for r in got] == [k for k, _ in expected]
    # same seed twice -> identical sample
    a = dsir_resample(raw_df, fit, n=3, seed=7, n_buckets=B).collect()
    b = dsir_resample(raw_df, fit, n=3, seed=7, n_buckets=B).collect()
    assert a == b


def test_resample_guard(raw_df, fit):
    with pytest.raises(ValueError):
        dsir_resample(raw_df, fit, n=0, n_buckets=B)


def test_precomputed_features_identical(raw_df, fit):
    from fulltextsearchengine_spark.operators.dsir import (
        dsir_fit,
        dsir_log_weights,
        hashed_ngram_features,
    )

    feats = hashed_ngram_features(raw_df, n_buckets=B).cache()
    fit2 = dsir_fit(
        raw_df,
        raw_df.filter("doc_id % 2 = 0 AND doc_id < 5"),
        n_buckets=B,
        raw_features=feats,
    )
    assert sorted(map(tuple, fit.collect())) == sorted(map(tuple, fit2.collect()))
    w1 = dsir_log_weights(raw_df, fit, n_buckets=B).collect()
    w2 = dsir_log_weights(raw_df, fit, n_buckets=B, features=feats).collect()
    assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))
