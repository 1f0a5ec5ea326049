"""SemDeDup: within-cluster pair generation, prototypicality, and the
keep-lowest-centroid-cosine rule vs a numpy recomputation (k-means
itself is parity-tested in test_clustering_contrastive)."""

from __future__ import annotations

import numpy as np
import pytest

from fulltextsearchengine_spark.operators.clustering import kmeans_assign, kmeans_fit
from fulltextsearchengine_spark.operators.semdedup import (
    prototypicality,
    semantic_dedup,
    semdedup_pairs,
)

# two well-separated blobs; ids 0-3 are near-duplicates of each other,
# 10-11 are a second duplicate pair, 12 and 4 are loners
VECS = {
    0: [1.00, 0.02, 0.0],
    1: [0.99, 0.01, 0.0],
    2: [1.01, 0.03, 0.0],
    3: [0.98, 0.00, 0.0],
    4: [0.60, 0.80, 0.0],  # same blob, not a duplicate of 0-3
    10: [0.0, 0.01, 1.00],
    11: [0.0, 0.02, 0.99],
    12: [0.0, 0.80, 0.60],  # second blob loner
}
TAU = 0.995


def _cos(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, [float(x) for x in v]) for i, v in sorted(VECS.items())]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_pairs_within_cluster_match_numpy(emb):
    cent = kmeans_fit(emb, k=2)
    assigned = {r["vec_id"]: r["cluster"] for r in kmeans_assign(emb, cent).collect()}
    got = {
        (r["vec_a"], r["vec_b"]): r["cos_micro"]
        for r in semdedup_pairs(emb, kmeans_assign(emb, cent), TAU).collect()
    }
    # float32 storage: mirror the engine's cast chain
    f32 = {i: np.asarray(v, np.float32).astype(np.float64) for i, v in VECS.items()}
    expected = {}
    for a in VECS:
        for b in VECS:
            if a < b and assigned[a] == assigned[b]:
                c = round(_cos(f32[a], f32[b]) * 1e6)
                if c >= round(TAU * 1e6):
                    expected[(a, b)] = c
    assert got == expected
    assert (0, 1) in got and (10, 11) in got  # dup structure present


def test_prototypicality_matches_numpy(emb):
    cent = kmeans_fit(emb, k=2)
    assigned = {r["vec_id"]: r["cluster"] for r in kmeans_assign(emb, cent).collect()}
    f32 = {i: np.asarray(v, np.float32).astype(np.float64) for i, v in VECS.items()}
    got = {
        r["vec_id"]: (r["cluster"], r["proto_micro"])
        for r in prototypicality(emb, cent).collect()
    }
    for i in VECS:
        c = assigned[i]
        assert got[i][0] == c
        assert got[i][1] == pytest.approx(
            round(_cos(f32[i], cent[c]) * 1e6), abs=1
        )


def test_semantic_dedup_keep_rule(emb):
    out = {r["vec_id"]: (r["kept"], r["proto_micro"]) for r in semantic_dedup(emb, k=2, tau=TAU).collect()}
    assert set(out) == set(VECS)
    # loners always kept
    assert out[4][0] and out[12][0]
    # exactly one keeper among each duplicate component
    grp1 = [i for i in (0, 1, 2, 3) if out[i][0]]
    grp2 = [i for i in (10, 11) if out[i][0]]
    assert len(grp1) == 1 and len(grp2) == 1
    # keeper = lowest centroid-cosine (least prototypical), tie lowest id
    for grp, members in ((grp1, (0, 1, 2, 3)), (grp2, (10, 11))):
        best = min(members, key=lambda i: (out[i][1], i))
        assert grp == [best]


def test_semdedup_tau_guard(emb):
    cent = kmeans_fit(emb, k=2)
    with pytest.raises(ValueError):
        semdedup_pairs(emb, kmeans_assign(emb, cent), 0.0)
