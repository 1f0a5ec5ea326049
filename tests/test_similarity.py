"""Similarity search vs numpy oracle: exact cosine top-k, SRP-LSH
recall, near-dup pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

DIM = 16
N = 200


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((N, DIM)).astype(np.float32)
    # plant near-duplicates: 150≈0, 151≈1
    vecs[150] = vecs[0] + rng.standard_normal(DIM).astype(np.float32) * 0.01
    vecs[151] = vecs[1] + rng.standard_normal(DIM).astype(np.float32) * 0.01
    pdf = pd.DataFrame({"vec_id": range(N), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    return df, vecs


def _cosine_oracle(vecs: np.ndarray, q: np.ndarray) -> np.ndarray:
    v = vecs.astype(np.float64)
    qq = q.astype(np.float64)
    return (v @ qq) / (np.linalg.norm(v, axis=1) * np.linalg.norm(qq))


def test_cosine_topk_exact(emb):
    from fulltextsearchengine_spark.operators.similarity import cosine_topk

    df, vecs = emb
    q = vecs[3].tolist()
    got = [(r["vec_id"], r["cosine"]) for r in cosine_topk(df, q, 10).collect()]
    cos = _cosine_oracle(vecs, np.asarray(q))
    order = sorted(range(N), key=lambda i: (-cos[i], i))[:10]
    assert [g[0] for g in got] == order
    for (gid, gc), oid in zip(got, order):
        assert gc == pytest.approx(cos[oid], rel=1e-6)


def test_cosine_topk_tombstoned(emb):
    from fulltextsearchengine_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivf_train_centroids,
    )

    df, vecs = emb
    q = vecs[3].tolist()
    base = [r["vec_id"] for r in cosine_topk(df, q, 10).collect()]
    dead = base[:2]  # kill the top-2 live results
    got = [r["vec_id"] for r in cosine_topk(df, q, 10, tombstones=dead).collect()]
    cos = _cosine_oracle(vecs, np.asarray(q))
    order = [i for i in sorted(range(N), key=lambda i: (-cos[i], i)) if i not in dead]
    assert got == order[:10]  # dead filtered BEFORE top-k: still 10 live
    # DataFrame-shaped tombstones behave identically
    spark = df.sparkSession
    tomb_df = spark.createDataFrame([(int(d),) for d in dead], "vec_id long")
    got2 = [r["vec_id"] for r in cosine_topk(df, q, 10, tombstones=tomb_df).collect()]
    assert got2 == got
    # empty tombstones = no-op
    assert [r["vec_id"] for r in cosine_topk(df, q, 10, tombstones=[]).collect()] == base
    # IVF path masks inside the probed lists too
    cents = ivf_train_centroids(df, 4, DIM, seed=7)
    ivf_live = [
        r["vec_id"]
        for r in ivf_topk(df, q, 5, cents, n_probe=4, tombstones=dead).collect()
    ]
    assert ivf_live == order[:5]  # n_probe=all lists → exact minus dead


def test_srp_topk_recall(emb):
    from fulltextsearchengine_spark.operators.similarity import srp_bucketed_topk

    df, vecs = emb
    hits = 0
    trials = 5
    for qi in range(trials):
        q = vecs[qi].tolist()
        got = {r["vec_id"] for r in
               srp_bucketed_topk(df, q, 5, dim=DIM, n_planes=8, multiprobe_hamming=1).collect()}
        cos = _cosine_oracle(vecs, np.asarray(q))
        top5 = set(sorted(range(N), key=lambda i: (-cos[i], i))[:5])
        assert qi in got  # the query vector itself always lands in its own bucket
        hits += len(got & top5)
    assert hits >= trials * 2  # recall well above random (5/200 per draw)


def test_cosine_near_pairs(emb):
    from fulltextsearchengine_spark.operators.similarity import cosine_near_pairs

    df, vecs = emb
    got = {(r["vec_a"], r["vec_b"]): r["cosine_micro"] for r in
           cosine_near_pairs(df, threshold=0.95, exact_baseline=True).collect()}
    v = vecs.astype(np.float64)
    unit = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = unit @ unit.T
    exp = {}
    for i in range(N):
        for j in range(i + 1, N):
            if sims[i, j] >= 0.95:
                exp[(i, j)] = round(sims[i, j] * 1e6)
    assert set(got) == set(exp)
    assert (0, 150) in got and (1, 151) in got
    for k in got:
        assert abs(got[k] - exp[k]) <= 2  # float32->double path, ulp slack


def test_cosine_near_pairs_bucketed_default(emb):
    """Default path is SRP-bucketed: an equi-join on bucket (never a
    cartesian), results ⊆ exact, and true near-dups (θ→0) are found."""
    from fulltextsearchengine_spark.operators.similarity import cosine_near_pairs

    df, vecs = emb
    bucketed = cosine_near_pairs(df, threshold=0.95)  # default = bucketed
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    got = {(r["vec_a"], r["vec_b"]): r["cosine_micro"] for r in bucketed.collect()}
    exact = {(r["vec_a"], r["vec_b"]): r["cosine_micro"] for r in
             cosine_near_pairs(df, threshold=0.95, exact_baseline=True).collect()}
    assert set(got) <= set(exact)
    # planted near-dups (cosine ≈ 0.9999, θ ≈ 0) collide at n_planes=8
    assert (0, 150) in got and (1, 151) in got
    for k in got:
        assert got[k] == exact[k]


def test_srp_persisted_index(emb, tmp_path_factory):
    """SrpAnnIndex: build once partitioned by bucket; the query scan is
    partition-PRUNED (PartitionFilters on bucket, not a full scan) and
    results equal the on-the-fly srp_bucketed_topk."""
    from fulltextsearchengine_spark.operators.similarity import (
        SrpAnnIndex,
        srp_bucketed_topk,
    )

    df, vecs = emb
    path = str(tmp_path_factory.mktemp("srpidx") / "emb_by_bucket")
    idx = SrpAnnIndex.build(df, path, dim=DIM, n_planes=8)
    loaded = SrpAnnIndex.load(df.sparkSession, path)
    for qi in range(3):
        q = vecs[qi].tolist()
        got_df = loaded.topk(q, 5, multiprobe_hamming=1)
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "bucket" in plan.split("PartitionFilters", 1)[1][:300]
        got = [(r["vec_id"], r["cosine"]) for r in got_df.collect()]
        exp = [(r["vec_id"], r["cosine"]) for r in
               srp_bucketed_topk(df, q, 5, dim=DIM, n_planes=8, multiprobe_hamming=1).collect()]
        assert [g[0] for g in got] == [e[0] for e in exp]
    assert idx.meta == loaded.meta


def test_ivf_persisted_index(emb, tmp_path_factory):
    """IvfAnnIndex: centroids persist in the sidecar; queries prune to
    n_probe partitions; full-probe equals exact brute force."""
    from fulltextsearchengine_spark.operators.similarity import IvfAnnIndex, cosine_topk

    df, vecs = emb
    path = str(tmp_path_factory.mktemp("ivfidx") / "emb_by_centroid")
    IvfAnnIndex.build(df, path, dim=DIM, n_centroids=8, seed=11)
    idx = IvfAnnIndex.load(df.sparkSession, path)
    assert idx.centroids.shape == (8, DIM)
    q = vecs[3].tolist()
    # probing ALL lists == exact brute force (plumbing is lossless)
    got = [r["vec_id"] for r in idx.topk(q, 10, n_probe=8).collect()]
    exp = [r["vec_id"] for r in cosine_topk(df, q, 10).collect()]
    assert got == exp
    # partial probe: pruned scan, query's own vector still found
    part = idx.topk(q, 5, n_probe=3)
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert 3 in [r["vec_id"] for r in part.collect()]


def test_ivf_topk_recall(emb):
    from fulltextsearchengine_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        ivf_train_centroids,
    )

    df, vecs = emb
    cent = ivf_train_centroids(df, n_centroids=8, dim=DIM, seed=11)
    assert cent.shape == (8, DIM)
    assigned = {r["vec_id"]: r["centroid"] for r in ivf_assign(df, cent).collect()}
    assert len(assigned) == N and set(assigned.values()) <= set(range(8))

    hits = 0
    trials = 5
    for qi in range(trials):
        q = vecs[qi].tolist()
        got = [r["vec_id"] for r in ivf_topk(df, q, 5, cent, n_probe=3).collect()]
        cos = _cosine_oracle(vecs, np.asarray(q))
        top5 = sorted(range(N), key=lambda i: (-cos[i], i))[:5]
        assert qi in got  # query's own vector is in a probed list
        hits += len(set(got) & set(top5))
    assert hits >= trials * 3  # n_probe=3/8 lists → high recall on top-5


def test_cosine_topk_batch_matches_single(emb):
    from fulltextsearchengine_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_batch,
        cosine_topk_batch_arrow,
    )

    df, vecs = emb
    queries = {f"q{i}": vecs[i].tolist() for i in range(3)}
    batch = cosine_topk_batch(df, queries, 8)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    arrow = cosine_topk_batch_arrow(df, queries, 8)
    got_arrow = {}
    for r in arrow.collect():
        got_arrow.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    for d in (got, got_arrow):  # collect order is unspecified — sort per query
        for qid in d:
            d[qid].sort(key=lambda x: (-x[1], x[0]))
    assert set(got) == set(queries) == set(got_arrow)
    for qid, qv in queries.items():
        exp = [(r["vec_id"], r["cosine"]) for r in cosine_topk(df, qv, 8).collect()]
        assert [g[0] for g in got[qid]] == [e[0] for e in exp]
        for g, e in zip(got[qid], exp):
            assert g[1] == pytest.approx(e[1], rel=1e-12)
        # arrow path: same ranks, scores within BLAS summation ulps
        assert [g[0] for g in got_arrow[qid]] == [e[0] for e in exp]
        for g, e in zip(got_arrow[qid], exp):
            assert g[1] == pytest.approx(e[1], rel=1e-9)


def test_mmr_rerank(emb):
    """MMR vs a brute-force Python oracle over the same relevance pool;
    the planted near-duplicate (150≈0) must be demoted below rank 2 even
    though its raw cosine is ~rank 2."""
    from fulltextsearchengine_spark.operators.similarity import mmr_rerank

    df, vecs = emb
    # query NEAR vec 0 but not equal: with q == vecs[0] exactly, the
    # pick-1 MMR score lam*rel - (1-lam)*sim(d,0) cancels to 0 for every
    # candidate at lam=0.5 (rel == sim-to-0) and selection degenerates
    # to fp-noise ordering
    q = (0.85 * vecs[0].astype(np.float64) + 0.35 * vecs[5].astype(np.float64))
    pool, k, lam = 50, 10, 0.6

    cos = _cosine_oracle(vecs, q)
    order = np.lexsort((np.arange(len(cos)), -cos))[:pool]
    ids = order.copy()
    rel = cos[order]
    V = vecs[order].astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1)[:, None]
    sim = Vn @ Vn.T
    sel, exp = [], []
    rem = np.ones(pool, bool)
    for _ in range(k):
        pen = sim[:, sel].max(axis=1) if sel else np.zeros(pool)
        sc = lam * rel - (1 - lam) * pen
        sc[~rem] = -np.inf
        b = int(np.lexsort((ids, -sc))[0])
        sel.append(b); rem[b] = False
        exp.append((int(ids[b]), float(sc[b])))

    got = mmr_rerank(df, q.tolist(), k, pool=pool, lam=lam)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-6)

    # pure relevance ranks the near-dup of vec 0 (doc 150) adjacent to
    # it; MMR must split the pair, not return them back-to-back
    pure = [int(i) for i in np.lexsort((np.arange(len(cos)), -cos))[:3]]
    assert set(pure[:2]) == {0, 150}
    got_ids = [g[0] for g in got]
    assert got_ids[0] in (0, 150) and got_ids[1] not in (0, 150)


def test_mean_pool_embeddings(spark):
    import numpy as np

    from fulltextsearchengine_spark.operators.similarity import (
        cosine_topk,
        mean_pool_embeddings,
    )

    vecs = {0: [1.0, 0.0], 1: [0.0, 1.0], 2: [2.0, 2.0], 3: [4.0, 0.0]}
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    mapping = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b")], "vec_id long, group_id string"
    )
    got = {
        r["group_id"]: r["embedding"]
        for r in mean_pool_embeddings(emb, mapping).collect()
    }
    assert got["a"] == [0.5, 0.5] and got["b"] == [3.0, 1.0]
    # pooled table feeds the existing dense ops at group granularity
    top = cosine_topk(
        mean_pool_embeddings(emb, mapping).withColumnRenamed("group_id", "vec_id"),
        [1.0, 0.0],
        1,
    ).collect()
    a = np.array([3.0, 1.0]); b = np.array([0.5, 0.5])
    best = "b" if a @ [1, 0] / np.linalg.norm(a) > b @ [1, 0] / np.linalg.norm(b) else "a"
    assert top[0]["vec_id"] == best
