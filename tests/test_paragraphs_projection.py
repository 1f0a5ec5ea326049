"""dedup_paragraphs, remove_duplicate_spans, and sparse_random_projection
vs brute-force Python reimplementations."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.dedup import remove_duplicate_spans
from fulltextsearchengine_spark.operators.paragraphs import dedup_paragraphs
from fulltextsearchengine_spark.operators.projection import (
    projection_matrix,
    sparse_random_projection,
)

# ---------------------------------------------------------------- paragraphs

DOCS = [
    (1, "alpha beta\nCOMMON BANNER\ngamma"),
    (2, "COMMON BANNER\ndelta epsilon\nx"),        # banner dup; 'x' short-exempt at min_chars=2
    (3, "delta epsilon\nCOMMON BANNER\n\nzeta"),   # both lines dup; empty line survives
    (4, "unique only"),
    (5, "  COMMON BANNER  \ntail"),                # trimmed form matches
]


def _brute_paragraphs(docs, min_chars):
    firsts = {}
    for doc_id, text in docs:
        for idx, line in enumerate(text.split("\n")):
            t = line.strip()
            if len(t) >= min_chars and t not in firsts:
                firsts[t] = (doc_id, idx)
    out = {}
    for doc_id, text in docs:
        kept, removed = [], 0
        lines = text.split("\n")
        for idx, line in enumerate(lines):
            t = line.strip()
            if len(t) < min_chars or firsts[t] == (doc_id, idx):
                kept.append(line)
            else:
                removed += 1
        out[doc_id] = ("\n".join(kept), len(lines), removed)
    return out


@pytest.mark.parametrize("min_chars", [1, 2])
def test_dedup_paragraphs_matches_brute(spark, min_chars):
    sdf = spark.createDataFrame(DOCS, "doc_id long, text string")
    want = _brute_paragraphs(DOCS, min_chars)
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in dedup_paragraphs(sdf, min_chars=min_chars).collect()
    }
    assert got == want


def test_dedup_paragraphs_all_removed(spark):
    docs = [(1, "dup line"), (2, "dup line"), (3, "dup line")]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in dedup_paragraphs(sdf).collect()}
    assert got == {1: "dup line", 2: "", 3: ""}


def test_dedup_paragraphs_guard(spark):
    sdf = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup_paragraphs(sdf, min_chars=0)


# ---------------------------------------------------------------- span removal


SPAN_DOCS = [
    (1, "a b c d e f g h"),          # the 4-gram "a b c d" dup'd in doc 3
    (2, "p q r s t u v w"),
    (3, "x y a b c d e z"),          # "a b c d" + overlap "b c d e"
    (4, "short doc"),
]


def _brute_remove(docs, n, min_count):
    from collections import Counter

    grams = Counter()
    doc_toks = {}
    for doc_id, text in docs:
        toks = oracle.tokenize(text)
        doc_toks[doc_id] = toks
        for i in range(len(toks) - n + 1):
            grams[" ".join(toks[i : i + n])] += 1
    hot = {g for g, c in grams.items() if c >= min_count}
    out = {}
    for doc_id, toks in doc_toks.items():
        covered = set()
        for i in range(len(toks) - n + 1):
            if " ".join(toks[i : i + n]) in hot:
                covered.update(range(i, i + n))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        out[doc_id] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


def test_remove_duplicate_spans_matches_brute(spark):
    n = 4
    sdf = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    want = _brute_remove(SPAN_DOCS, n, 2)
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(sdf, n=n, min_count=2).collect()
    }
    assert got == want
    # the duplicated 4-gram really was removed from both docs
    assert "a b c d" not in got[1][0] and "a b c d" not in got[3][0]
    assert got[4] == ("short doc", 2, 0)  # shorter than n: untouched


def test_remove_duplicate_spans_self_repeat(spark):
    """A doc repeating its own block counts as duplication (Lee et al.)."""
    docs = [(1, "m n o p z z m n o p"), (2, "only unique words here")]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    want = _brute_remove(docs, 4, 2)
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(sdf, n=4, min_count=2).collect()
    }
    assert got == want
    assert got[1][2] == 8  # both copies cut, 'z z' survives


def test_remove_duplicate_spans_guards(spark):
    sdf = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        remove_duplicate_spans(sdf, n=1)
    with pytest.raises(ValueError):
        remove_duplicate_spans(sdf, min_count=1)


# ---------------------------------------------------------------- projection


def test_projection_matrix_deterministic_md5():
    m = projection_matrix(8, 4, seed=7)
    s = math.sqrt(4.0 / 4)
    for i in range(4):
        for j in range(8):
            nib = int(hashlib.md5(f"7:{i}:{j}".encode()).hexdigest()[0], 16)
            want = s if nib <= 1 else (-s if nib <= 3 else 0.0)
            assert m[i, j] == want
    # same seed same matrix; different seed differs somewhere
    assert np.array_equal(m, projection_matrix(8, 4, seed=7))
    assert not np.array_equal(m, projection_matrix(8, 4, seed=8))


def test_sparse_random_projection_matches_numpy(spark):
    rng = np.random.RandomState(3)
    vecs = [(i, rng.randn(16).astype(np.float32).tolist()) for i in range(40)]
    sdf = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: np.array(r["projected"])
        for r in sparse_random_projection(sdf, out_dim=6, seed=11).collect()
    }
    mat = projection_matrix(16, 6, seed=11)
    for vid, v in vecs:
        want = mat @ np.asarray(v, dtype=np.float64)
        np.testing.assert_allclose(got[vid], want, rtol=1e-12)


def test_sparse_random_projection_preserves_distances(spark):
    """JL sanity: projected pairwise sq-distances within a loose band."""
    rng = np.random.RandomState(5)
    raw = rng.randn(30, 64)
    sdf = spark.createDataFrame(
        [(i, raw[i].tolist()) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: np.array(r["projected"])
        for r in sparse_random_projection(sdf, out_dim=32, seed=0).collect()
    }
    ratios = []
    for i in range(0, 30, 3):
        for j in range(i + 1, 30, 7):
            d0 = np.sum((raw[i] - raw[j]) ** 2)
            d1 = np.sum((got[i] - got[j]) ** 2)
            ratios.append(d1 / d0)
    assert 0.5 < float(np.median(ratios)) < 1.5


def test_projection_guards():
    with pytest.raises(ValueError):
        projection_matrix(0, 4, seed=1)
