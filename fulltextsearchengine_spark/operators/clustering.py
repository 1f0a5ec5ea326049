"""Distributed k-means over the embeddings table — corpus clustering as
a first-class operator (topic discovery, stratification keys for the
mixture planner, coarse quantizers for IVF layouts).

``similarity.ivf_train_centroids`` trains on a driver-side SAMPLE (the
right call for an ANN coarse quantizer); this module is the FULL-CORPUS
Lloyd iteration for when cluster assignments of every row are the
product, not a serving shortcut:

  assign   mapInPandas argmin ‖x − c_j‖² over broadcast centroids —
           embarrassingly parallel, zero shuffles;
  update   per-BATCH partial sums (cluster, n, Σx) emitted from the same
           Arrow pass — each task reduces its rows to ≤k tiny rows (the
           map-side-combine shape; MLlib's treeAggregate equivalent) —
           then the driver folds k·dim doubles and re-quantizes.

Determinism contract (what makes the DuckDB gate value-exact):
  - init = the k smallest ``id_col`` rows' vectors (no RNG);
  - ties in argmin break toward the lowest cluster id;
  - centroids are quantized to 1e-6 after init and after every update,
    so cross-engine float-sum ulp noise cannot compound across
    iterations (same strategy as the micro-int gate scores);
  - empty clusters keep their previous centroid.

Scale shape at 100 TB: per iteration ONE pass over the vectors, network
traffic = n_tasks · k · dim doubles (KBs), driver state = k · dim. The
iteration count is a config constant — the standard fixed-budget Lloyd
used by every large-scale pipeline (convergence-checked variants just
read the same partials).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1e6


def _quantize(c: np.ndarray) -> np.ndarray:
    return np.round(c * QUANT) / QUANT


def init_centroids(
    embeddings: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic seed: the k smallest-id vectors, quantized."""
    rows = embeddings.select(id_col, vec_col).orderBy(F.asc(id_col)).limit(k).collect()
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    return _quantize(np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows]))


def kmeans_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster): nearest-centroid by squared L2, ties to the
    lowest cluster id (np.argmin first-occurrence ≙ ORDER BY dist, cid)."""
    c = centroids

    def assign(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col], "cluster": np.argmin(d, axis=1).astype(np.int64)}
            )

    return embeddings.mapInPandas(assign, schema="vec_id long, cluster long")


def kmeans_fit(
    embeddings: DataFrame,
    k: int,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(k, dim) float64 centroids after ``n_iters`` full-corpus Lloyd
    iterations from the deterministic init."""
    cent = init_centroids(embeddings, k, id_col, vec_col)
    dim = cent.shape[1]

    for _ in range(n_iters):
        c = cent

        def partials(batches):
            for pdf in batches:
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                a = np.argmin(d, axis=1)
                out = []
                for j in np.unique(a):
                    members = m[a == j]
                    out.append((int(j), len(members), members.sum(axis=0).tolist()))
                yield pd.DataFrame(out, columns=["cluster", "n", "sums"])

        rows = embeddings.mapInPandas(
            partials, schema="cluster long, n long, sums array<double>"
        ).collect()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for r in rows:
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["sums"], dtype=np.float64)
        nonempty = counts > 0
        new = cent.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        cent = _quantize(new)
    return cent


def kmeans_cluster(
    embeddings: DataFrame,
    k: int,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster): final assignments after fit — the clustered-
    corpus table (join key for topic stats, mixture strata, IVF lists)."""
    cent = kmeans_fit(embeddings, k, n_iters, id_col, vec_col)
    return kmeans_assign(embeddings, cent, id_col, vec_col)
