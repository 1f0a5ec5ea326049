"""Product quantization (encode / ADC / trained recall) and
incremental IVF append vs numpy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fulltextsearchengine_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_seeded_codebooks,
    pq_train_codebooks,
)

DIM = 16
M = 4
CODES = 8
N = 200


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((N, DIM)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(N), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    return df, vecs


def _unit(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _brute_codes(vecs, books):
    m, _, sub = books.shape
    u = _unit(vecs.astype(np.float64))
    out = np.empty((len(u), m), dtype=np.int64)
    for j in range(m):
        block = u[:, j * sub : (j + 1) * sub]
        d = ((block[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        out[:, j] = np.argmin(d, axis=1)
    return out


def test_pq_encode_matches_brute_force(emb):
    df, vecs = emb
    books = pq_seeded_codebooks(DIM, M, CODES, seed=7)
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
    expected = _brute_codes(vecs, books)
    assert len(got) == N
    for i in range(N):
        assert got[i] == expected[i].tolist()


def test_pq_adc_matches_brute_force(emb):
    df, vecs = emb
    books = pq_seeded_codebooks(DIM, M, CODES, seed=7)
    codes_df = pq_encode(df, books)
    q = vecs[5].tolist()
    got = [(r["vec_id"], r["adc"]) for r in pq_adc_topk(codes_df, q, books, 10).collect()]

    qn = np.asarray(q, dtype=np.float64)
    qn /= np.linalg.norm(qn)
    sub = DIM // M
    lut = np.stack([books[j] @ qn[j * sub : (j + 1) * sub] for j in range(M)])
    codes = _brute_codes(vecs, books)
    scores = np.zeros(N)
    for j in range(M):
        scores = scores + lut[j][codes[:, j]]
    order = sorted(range(N), key=lambda i: (-scores[i], i))[:10]
    assert [g[0] for g in got] == order
    for (_, a), i in zip(got, order):
        assert a == pytest.approx(scores[i], rel=1e-12)


def test_pq_trained_recall(emb):
    """Trained codebooks: ADC top-10 recalls most of the exact cosine
    top-10 (random codebooks would not — this pins that training
    actually fits the data)."""
    df, vecs = emb
    m_fine = 8  # finer subspaces than the arithmetic tests: recall on
    # unclustered Gaussian data (PQ's worst case) needs resolution
    books = pq_train_codebooks(df, DIM, m=m_fine, n_codes=CODES, sample_size=N, seed=3)
    rand_books = pq_seeded_codebooks(DIM, m_fine, CODES, seed=7)
    codes_df = pq_encode(df, books).cache()
    u = _unit(vecs.astype(np.float64))
    hits_trained = 0
    for qi in range(5):
        q = vecs[qi].tolist()
        got = {r["vec_id"] for r in pq_adc_topk(codes_df, q, books, 10).collect()}
        cos = u @ (u[qi])
        top = set(sorted(range(N), key=lambda i: (-cos[i], i))[:10])
        hits_trained += len(got & top)
    assert hits_trained >= 25  # ≥50% recall@10 across 5 queries

    # and trained beats the data-independent seeded baseline
    codes_rand = pq_encode(df, rand_books).cache()
    hits_rand = 0
    for qi in range(5):
        q = vecs[qi].tolist()
        got = {r["vec_id"] for r in pq_adc_topk(codes_rand, q, rand_books, 10).collect()}
        cos = u @ (u[qi])
        top = set(sorted(range(N), key=lambda i: (-cos[i], i))[:10])
        hits_rand += len(got & top)
    assert hits_trained > hits_rand


def test_pq_guards():
    with pytest.raises(ValueError):
        pq_seeded_codebooks(DIM, 3, CODES)  # 16 % 3 != 0


def test_ivf_append_equals_rebuild(emb, tmp_path):
    """Append wave assigned by the standing quantizer: full-probe top-k
    over the appended layout == brute-force cosine over the union, and
    == a from-scratch build with the same centroids."""
    from fulltextsearchengine_spark.operators.similarity import IvfAnnIndex

    df, vecs = emb
    old = df.filter("vec_id < 150")
    new = df.filter("vec_id >= 150")
    idx = IvfAnnIndex.build(old, str(tmp_path / "ivf"), dim=DIM, n_centroids=4, seed=5)
    idx.append(new)

    q = vecs[3].tolist()
    got = [(r["vec_id"], r["cosine"]) for r in idx.topk(q, 10, n_probe=4).collect()]
    u = vecs.astype(np.float64)
    cos = (u @ np.asarray(q)) / (np.linalg.norm(u, axis=1) * np.linalg.norm(q))
    order = sorted(range(N), key=lambda i: (-cos[i], i))[:10]
    assert [g[0] for g in got] == order
    for (_, a), i in zip(got, order):
        assert a == pytest.approx(cos[i], rel=1e-6)

    # appended rows landed in their nearest standing centroid partition
    reloaded = IvfAnnIndex.load(df.sparkSession, str(tmp_path / "ivf"))
    rows = reloaded.spark.read.parquet(reloaded.path).filter("vec_id >= 150").collect()
    c = reloaded.centroids
    un = _unit(vecs.astype(np.float64))
    for r in rows:
        assert r["centroid"] == int(np.argmax(c @ un[r["vec_id"]]))


def test_ivfpq_full_probe_refine_is_exact(emb, tmp_path):
    """n_probe = n_centroids and refine = N → exact brute-force cosine
    top-k: the whole partition→ADC→refine pipeline collapses to the
    ground truth when nothing is pruned."""
    from fulltextsearchengine_spark.operators.pq import IvfPqIndex

    df, vecs = emb
    idx = IvfPqIndex.build(
        df, str(tmp_path / "ivfpq"), dim=DIM, n_centroids=4, m=M, n_codes=CODES, seed=5
    )
    q = vecs[2].tolist()
    got = [
        (r["vec_id"], r["cosine"])
        for r in idx.topk(q, 10, n_probe=4, refine=N, embeddings=df).collect()
    ]
    u = vecs.astype(np.float64)
    cos = (u @ np.asarray(q)) / (np.linalg.norm(u, axis=1) * np.linalg.norm(q))
    order = sorted(range(N), key=lambda i: (-cos[i], i))[:10]
    assert [g[0] for g in got] == order
    for (_, a), i in zip(got, order):
        assert a == pytest.approx(cos[i], rel=1e-6)


def test_ivfpq_append_matches_standing_quantizers(emb, tmp_path):
    """Appended wave encoded by the STANDING codebooks: full-probe ADC
    over the layout == plain ADC over the union encoded with the same
    codebooks."""
    from fulltextsearchengine_spark.operators.pq import IvfPqIndex

    df, vecs = emb
    idx = IvfPqIndex.build(
        df.filter("vec_id < 120"),
        str(tmp_path / "ivfpq_app"),
        dim=DIM,
        n_centroids=4,
        m=M,
        n_codes=CODES,
        seed=5,
    )
    idx.append(df.filter("vec_id >= 120"))
    q = vecs[9].tolist()
    got = [(r["vec_id"], r["adc"]) for r in idx.topk(q, 10, n_probe=4).collect()]
    expected = [
        (r["vec_id"], r["adc"])
        for r in pq_adc_topk(pq_encode(df, idx.codebooks), q, idx.codebooks, 10).collect()
    ]
    assert [g[0] for g in got] == [e[0] for e in expected]
    for (_, a), (_, b) in zip(got, expected):
        assert a == pytest.approx(b, rel=1e-12)


def test_ivfpq_partial_probe_recall(emb, tmp_path):
    """Pruned probes still recall most of the exact top-10 (and the
    guard: refine without embeddings raises)."""
    from fulltextsearchengine_spark.operators.pq import IvfPqIndex

    df, vecs = emb
    idx = IvfPqIndex.build(
        df, str(tmp_path / "ivfpq_r"), dim=DIM, n_centroids=4, m=8, n_codes=CODES, seed=5
    )
    u = vecs.astype(np.float64)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    hits = 0
    for qi in range(5):
        q = vecs[qi].tolist()
        got = {
            r["vec_id"]
            for r in idx.topk(q, 10, n_probe=2, refine=50, embeddings=df).collect()
        }
        cos = u @ u[qi]
        top = set(sorted(range(N), key=lambda i: (-cos[i], i))[:10])
        hits += len(got & top)
    assert hits >= 25
    with pytest.raises(ValueError):
        idx.topk(vecs[0].tolist(), 5, refine=10)
