"""Distributed k-means vs a numpy reimplementation of the same
deterministic contract; contrastive pair mining vs brute-force
positives/negatives built from the engine's own (already-oracled)
single-query BM25."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fulltextsearchengine_spark.operators.clustering import (
    init_centroids,
    kmeans_assign,
    kmeans_cluster,
    kmeans_fit,
)
from fulltextsearchengine_spark.operators.contrastive import contrastive_pairs
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.sources.rawlog import TRANSCRIPT_SCHEMA

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _numpy_kmeans(vecs: np.ndarray, ids: np.ndarray, k: int, n_iters: int):
    order = np.argsort(ids)
    cent = vecs[order[:k]].astype(np.float64)
    cent = np.round(cent * 1e6) / 1e6
    for _ in range(n_iters):
        d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        new = cent.copy()
        for j in range(k):
            members = vecs[a == j]
            if len(members):
                new[j] = members.sum(axis=0) / len(members)
        cent = np.round(new * 1e6) / 1e6
    d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return cent, np.argmin(d, axis=1)


def test_kmeans_matches_numpy(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    cent_np, assign_np = _numpy_kmeans(vecs, ids, k=4, n_iters=3)
    expected = dict(zip(ids.tolist(), assign_np.tolist()))

    cent = kmeans_fit(emb, k=4, n_iters=3)
    assert np.array_equal(cent, cent_np)
    got = {
        r["vec_id"]: r["cluster"] for r in kmeans_cluster(emb, k=4, n_iters=3).collect()
    }
    assert got == expected
    assert set(got.values()) == set(range(4))  # no degenerate single cluster


def test_kmeans_init_deterministic_and_guarded(emb):
    c1 = init_centroids(emb, 3)
    c2 = init_centroids(emb, 3)
    assert np.array_equal(c1, c2)
    with pytest.raises(ValueError):
        init_centroids(emb.limit(2), 5)


def test_kmeans_assign_tie_breaks_low_cluster(spark):
    # two identical centroids: every point must land in cluster 0
    df = spark.createDataFrame(
        [(1, [0.5, 0.5]), (2, [1.5, -0.5])], "vec_id long, embedding array<double>"
    )
    cent = np.array([[1.0, 0.0], [1.0, 0.0]])
    got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, cent).collect()}
    assert got == {1: 0, 2: 0}


# --- contrastive pairs ------------------------------------------------------


@pytest.fixture(scope="module")
def searcher(spark, small_transcripts_pdf):
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    idx.postings = idx.postings.cache()
    idx.docs = idx.docs.cache()
    return Searcher(idx)


def test_contrastive_pairs_matches_brute(searcher):
    from fulltextsearchengine_spark.operators.evaluation import probe_queries

    anchors = [3, 41, 500]
    n_neg, m = 3, 3
    meta = {
        r["doc_id"]: (r["conv_id"], r["turn_idx"])
        for r in searcher.index.docs.select("doc_id", "conv_id", "turn_idx").collect()
    }
    by_conv_turn = {(c, t): d for d, (c, t) in meta.items()}
    queries = probe_queries(searcher, anchors, m=m)

    expected = []
    for a in anchors:
        conv, turn = meta[a]
        pos = by_conv_turn.get((conv, turn + 1))
        if pos is None or not queries[a]:
            continue
        hits = searcher.bm25_search(queries[a], n_neg + 60).collect()
        negs = [r["doc_id"] for r in hits if meta[r["doc_id"]][0] != conv][:n_neg]
        expected.extend((a, pos, nd, i + 1) for i, nd in enumerate(negs))

    got = [
        (r["anchor_doc_id"], r["pos_doc_id"], r["neg_doc_id"], r["neg_rank"])
        for r in contrastive_pairs(searcher, anchors, n_neg=n_neg, m_terms=m)
        .orderBy("anchor_doc_id", "neg_rank")
        .collect()
    ]
    assert got == sorted(expected, key=lambda x: (x[0], x[3]))
    assert len(got) > 0


def test_contrastive_last_turn_anchor_dropped(searcher):
    # the last doc of the corpus ends its conversation — no positive
    last = searcher.stats["num_docs"]
    out = contrastive_pairs(searcher, [last], n_neg=2).collect()
    assert out == []


def test_contrastive_empty_anchors_raise(searcher):
    with pytest.raises(ValueError):
        contrastive_pairs(searcher, [])
