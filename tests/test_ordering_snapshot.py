"""Tests for training-order shuffle, snapshot dedup, quality-weighted
canonical pick, and int8 embedding quantization."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------- training order ----------

def _expected_order(ids: list[int], seed: int) -> dict[int, int]:
    keyed = sorted(ids, key=lambda i: (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i))
    return {i: pos + 1 for pos, i in enumerate(keyed)}


def test_training_order_matches_reference_and_is_total(spark):
    from fulltextsearchengine_spark.operators.ordering import training_order

    df = spark.createDataFrame([(i, f"d{i}") for i in range(200)], "doc_id long, text string")
    got = {
        r["doc_id"]: r["epoch_pos"]
        for r in training_order(df, seed=7).select("doc_id", "epoch_pos").collect()
    }
    assert got == _expected_order(list(range(200)), 7)
    assert sorted(got.values()) == list(range(1, 201))  # dense permutation


def test_training_order_partitioning_invariant(spark):
    # the whole point: same seed → same order at any parallelism/layout
    from fulltextsearchengine_spark.operators.ordering import training_order

    rows = [(i, f"d{i}") for i in range(300)]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    b = spark.createDataFrame(rows, "doc_id long, text string").repartition(17, "text")
    ga = {r["doc_id"]: r["epoch_pos"] for r in training_order(a, seed=3, num_partitions=2).collect()}
    gb = {r["doc_id"]: r["epoch_pos"] for r in training_order(b, seed=3, num_partitions=11).collect()}
    assert ga == gb


def test_training_order_seeds_differ(spark):
    from fulltextsearchengine_spark.operators.ordering import training_order

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    g0 = [r["doc_id"] for r in training_order(df, seed=0).orderBy("epoch_pos").collect()]
    g1 = [r["doc_id"] for r in training_order(df, seed=1).orderBy("epoch_pos").collect()]
    assert g0 != g1 and sorted(g0) == sorted(g1)


# ---------- quality-weighted canonical ----------

def test_dedup_canonical_score_pick(spark):
    from fulltextsearchengine_spark.operators.dedup_groups import dedup_canonical

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (5, 99)],
        "doc_id long, quality long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    # component {1,2,3}: top quality 30 tied between 2 and 3 → min doc_id 2
    kept = sorted(
        r["doc_id"]
        for r in dedup_canonical(docs, pairs, score_col="quality").collect()
    )
    assert kept == [2, 4, 5]


# ---------- snapshot dedup ----------

def test_dedup_against_snapshot_exact(spark):
    from fulltextsearchengine_spark.operators.snapshot import (
        dedup_against_snapshot,
        snapshot_fingerprints,
    )

    prior = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "hello world")], "doc_id long, text string"
    )
    wave = spark.createDataFrame(
        [
            (10, "THE  Quick brown FOX"),   # normalizes to a prior doc → drop
            (11, "hello world"),            # verbatim dup → drop
            (12, "a genuinely new doc"),    # keep
        ],
        "doc_id long, text string",
    )
    snap = snapshot_fingerprints(prior)
    kept = sorted(r["doc_id"] for r in dedup_against_snapshot(wave, snap).collect())
    assert kept == [12]
    # schema passes through (no fingerprint residue)
    assert dedup_against_snapshot(wave, snap).columns == ["doc_id", "text"]


def test_simhash_against_snapshot_near(spark):
    from fulltextsearchengine_spark.operators.dedup import simhash64
    from fulltextsearchengine_spark.operators.snapshot import simhash_against_snapshot

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    prior = spark.createDataFrame([(1, base)], "doc_id long, text string")
    wave = spark.createDataFrame(
        [
            (10, base),                                   # identical → hamming 0 → drop
            (11, base.replace("kappa", "lambda")),        # near → drop iff ≤ max_hamming
            (12, "completely unrelated words about ships and harbors and tides"),
        ],
        "doc_id long, text string",
    )
    # ground truth via brute-force hamming on the signatures
    sigs = {r["doc_id"]: r["simhash"] for r in simhash64(prior.union(wave)).collect()}
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
    expect = sorted(d for d in (10, 11, 12) if ham(d, 1) > 3)
    kept = sorted(
        r["doc_id"]
        for r in simhash_against_snapshot(wave, prior, max_hamming=3).collect()
    )
    assert kept == expect
    assert 10 not in kept and 12 in kept


def test_simhash_against_snapshot_precomputed_sigs(spark):
    # snapshot side can be a stored (doc_id, simhash) table — text not read
    from fulltextsearchengine_spark.operators.dedup import simhash64
    from fulltextsearchengine_spark.operators.snapshot import simhash_against_snapshot

    base = "one two three four five six seven eight nine ten"
    prior = spark.createDataFrame([(1, base)], "doc_id long, text string")
    wave = spark.createDataFrame(
        [(10, base), (12, "nothing in common with the prior corpus at all")],
        "doc_id long, text string",
    )
    via_text = sorted(r["doc_id"] for r in simhash_against_snapshot(wave, prior).collect())
    via_sigs = sorted(
        r["doc_id"]
        for r in simhash_against_snapshot(wave, simhash64(prior)).collect()
    )
    assert via_text == via_sigs == [12]


# ---------- int8 quantization ----------

def test_quantize_roundtrip_error_bound(spark):
    from fulltextsearchengine_spark.operators.similarity import quantize_embeddings

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(50)]
    rows.append((99, [0.0] * 16))  # all-zero vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for vid, vec in rows:
        q, s = out[vid]["qvec"], out[vid]["scale"]
        assert all(-127 <= x <= 127 for x in q)
        if vid == 99:
            assert s == 0.0 and all(x == 0 for x in q)
            continue
        # dequantized error ≤ scale/2 per component (float32 vec: compare
        # against the double-cast values Spark actually quantized)
        for orig, qi in zip(np.array(vec, dtype=np.float32).astype(float), q):
            assert abs(orig - qi * s) <= s / 2 + 1e-9


def test_quantized_dot_topk_matches_python(spark):
    from fulltextsearchengine_spark.operators.similarity import (
        quantize_embeddings,
        quantized_dot_topk,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # the stored column is float32 — query with the same float32-cast
    # values the corpus side quantizes (as the entry gate does via collect)
    qvec = [float(np.float32(x)) for x in rows[0][1]]

    def quant(v):
        v = np.array(v, dtype=np.float32).astype(np.float64)
        ma = np.abs(v).max()
        if ma == 0:
            return np.zeros(len(v), dtype=np.int64)
        return np.floor(np.abs(v) * 127.0 / ma + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)

    qq = quant(np.array(qvec, dtype=np.float32).astype(np.float64))
    expect = sorted(
        ((int(quant(v) @ qq), i) for i, v in rows), key=lambda t: (-t[0], t[1])
    )[:5]
    got = [
        (r["qdot"], r["vec_id"])
        for r in quantized_dot_topk(quantize_embeddings(df), qvec, 5).collect()
    ]
    assert got == expect
