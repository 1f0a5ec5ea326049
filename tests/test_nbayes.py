"""Multinomial NB classifier vs a pure-python reimplementation:
training cells, per-class scores (incl. OOV + empty docs), argmax
prediction, and the NULL-label guard."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from fulltextsearchengine_spark.functions.tokenize import tokenize_texts
from fulltextsearchengine_spark.operators.nbayes import (
    nb_predict,
    nb_scores,
    train_nb,
)

DOCS = [
    (0, "the cat sat on the mat with the dog", "en"),
    (1, "el gato grande duerme en la casa", "es"),
    (2, "the dog and the cat play in the garden", "en"),
    (3, "la casa verde tiene el jardin grande", "es"),
    (4, "a cat a dog a garden a house", "en"),
    (5, "el perro juega en el jardin verde", "es"),
    (6, "the quick dog runs to the garden gate", "en"),
    (7, "", "en"),  # empty text, labeled
    (8, "zzz qqq vvv totally unseen tokens", "en"),
]
TRAIN = [d for d in DOCS if d[0] < 6]  # both classes, 3 docs each


def _toks(t):
    return list(tokenize_texts(pd.Series([t])).iloc[0])


def _py_model():
    term_c, class_docs, class_toks = {}, Counter(), Counter()
    for _, t, y in TRAIN:
        toks = _toks(t)
        class_docs[y] += 1
        class_toks[y] += len(toks)
        for tok in toks:
            term_c[(y, tok)] = term_c.get((y, tok), 0) + 1
    vocab = {t for (_, t) in term_c}
    v = len(vocab)
    n = sum(class_docs.values())
    prior = {y: math.log(c / n) for y, c in class_docs.items()}
    oov = {y: math.log(1 / (class_toks[y] + v)) for y in class_docs}
    logp = {
        (y, t): math.log((term_c.get((y, t), 0) + 1) / (class_toks[y] + v))
        for y in class_docs
        for t in vocab
    }
    return vocab, v, prior, oov, logp, class_docs, class_toks


def _py_score(text, y, vocab, prior, oov, logp):
    s = prior[y]
    for tok in _toks(text):
        s += logp[(y, tok)] if tok in vocab else oov[y]
    return round(s * 1e6)


@pytest.fixture(scope="module")
def dfs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"]).cache()
    model = train_nb(df.filter("doc_id < 6"), "lang")
    return df, model


def test_model_cells_match_python(dfs):
    _, model = dfs
    vocab, v, prior, oov, logp, class_docs, class_toks = _py_model()
    assert model.vocab_size == v
    got_p = {
        r["label"]: (r["n_docs"], r["n_tokens"], r["log_prior"], r["oov_logp"])
        for r in model.priors.collect()
    }
    for y in class_docs:
        nd, nt, lp, ov = got_p[y]
        assert (nd, nt) == (class_docs[y], class_toks[y])
        assert lp == pytest.approx(prior[y], abs=1e-12)
        assert ov == pytest.approx(oov[y], abs=1e-12)
    got_l = {
        (r["label"], r["term"]): r["logp"] for r in model.likelihoods.collect()
    }
    assert set(got_l) == set(logp)  # dense vocab × labels grid
    for k, val in logp.items():
        assert got_l[k] == pytest.approx(val, abs=1e-12)


def test_scores_match_python_incl_oov_and_empty(dfs):
    df, model = dfs
    vocab, v, prior, oov, logp, *_ = _py_model()
    got = {
        (r["doc_id"], r["label"]): r["score_micro"]
        for r in nb_scores(df, model).collect()
    }
    for i, t, _ in DOCS:
        for y in prior:
            assert got[(i, y)] == _py_score(t, y, vocab, prior, oov, logp), (i, y)
    # empty doc scores exactly the prior
    for y in prior:
        assert got[(7, y)] == round(prior[y] * 1e6)


def test_predict_argmax_and_accuracy(dfs):
    df, model = dfs
    pred = {r["doc_id"]: r["pred_label"] for r in nb_predict(df, model).collect()}
    truth = {i: y for i, _, y in DOCS}
    # train docs and the held-out real-text doc 6 classify correctly
    assert all(pred[i] == truth[i] for i in (0, 1, 2, 3, 4, 5, 6))
    margins = {
        r["doc_id"]: r["margin_micro"] for r in nb_predict(df, model).collect()
    }
    assert all(m >= 0 for m in margins.values())


def test_null_label_guard(spark, dfs):
    df, _ = dfs
    bad = spark.createDataFrame(
        [(99, "x y z", None)], "doc_id: long, text: string, lang: string"
    )
    with pytest.raises(ValueError):
        train_nb(df.unionByName(bad), "lang")
