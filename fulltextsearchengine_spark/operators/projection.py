"""Deterministic sparse random projection for embedding columns.

Johnson–Lindenstrauss dimensionality reduction in the Achlioptas 2003 /
Li et al. 2006 sparse form: R[i][j] ∈ {+s, 0, −s} with
P(±s) = q/2 each, s = 1/√(q·out_dim), here q = 1/4 — so 3/4 of the
matrix is zeros and the projection is a cheap sparse matmul. A 64-d
corpus embedding projected to 16-d shrinks ANN index footprint 4× and
the brute-force scoring FLOPs with it; the standard pre-step before
LSH/IVF at 100-TB embedding volumes.

Determinism is the whole design: R[i][j] derives from
``md5(f"{seed}:{i}:{j}")``'s first hex nibble (0,1 → +s; 2,3 → −s;
else 0) — the same engine-independent hash trick the SimHash/DSIR
operators use — so the identical matrix reconstructs in any engine
(the DuckDB oracle twin builds it in SQL), reruns are stable, and
incremental corpus growth projects new vectors consistently with old
ones. No rand(), no state to persist beyond (seed, dims).

Plan shape: the matrix is (out_dim × in_dim) driver-built and closure-
captured into ONE Arrow-batched pandas UDF (a numpy matmul per batch);
zero shuffles, zero joins — a pure map pass, scan-bound at any scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def projection_matrix(in_dim: int, out_dim: int, seed: int) -> np.ndarray:
    """(out_dim, in_dim) float64 matrix, entry (i, j) from the first hex
    nibble of md5(f"{seed}:{i}:{j}"): {0,1} → +s, {2,3} → −s, else 0,
    with s = sqrt(4 / out_dim) (q = 1/4 sparsity, unit-variance rows)."""
    if in_dim <= 0 or out_dim <= 0:
        raise ValueError(f"dims must be ≥ 1, got in={in_dim}, out={out_dim}")
    s = float(np.sqrt(4.0 / out_dim))
    m = np.zeros((out_dim, in_dim), dtype=np.float64)
    for i in range(out_dim):
        for j in range(in_dim):
            nib = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[0], 16)
            if nib <= 1:
                m[i, j] = s
            elif nib <= 3:
                m[i, j] = -s
    return m


def sparse_random_projection(
    emb: DataFrame,
    out_dim: int,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """(id_col, out_col): each vector mapped to ``R @ v`` with the
    deterministic sparse matrix above. Input dim is read from the first
    row (all vectors must share it — ragged inputs raise inside the
    UDF, where the batch matmul would silently broadcast otherwise)."""
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        return emb.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias(out_col),
        )
    in_dim = int(first["d"])
    mat = projection_matrix(in_dim, out_dim, seed)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _project(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        arr = np.array([np.asarray(v, dtype=np.float64) for v in col])
        if arr.ndim != 2 or arr.shape[1] != in_dim:
            raise ValueError(f"expected uniform dim {in_dim}, got shape {arr.shape}")
        out = arr @ mat.T
        return pd.Series(list(out))

    return emb.select(F.col(id_col), _project(F.col(vec_col)).alias(out_col))


def projected_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    out_dim: int = 16,
    seed: int = 0,
    shortlist_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cosine): two-stage ANN through the projection — cosine
    top-(shortlist_factor·k) in the out_dim-d projected space (cheap:
    out_dim/in_dim of the FLOPs and bytes), then EXACT cosine re-rank
    of just the shortlist in the original space. The classic
    coarse-then-refine shape (same contract as ivf_topk's refine):
    returned scores are exact; only RECALL depends on the projection
    (JL distortion), and shortlist_factor is the recall dial.

    Scale shape: stage 1 is the projection map pass + a bounded top-N
    heap; stage 2 is a pushed ``In(vec_id, …)`` point fetch of
    shortlist_factor·k originals. At 100 TB you'd persist the projected
    table once (sparse_random_projection is deterministic, so appends
    project consistently) and amortize stage 1's map pass away."""
    from .similarity import cosine_scores, cosine_topk

    if k <= 0 or shortlist_factor < 1:
        raise ValueError(f"need k ≥ 1 and shortlist_factor ≥ 1, got {k}, {shortlist_factor}")
    proj = sparse_random_projection(
        emb, out_dim=out_dim, seed=seed, id_col=id_col, vec_col=vec_col
    )
    in_dim = len(query_vec)
    qp = (projection_matrix(in_dim, out_dim, seed) @ np.asarray(query_vec, dtype=np.float64)).tolist()
    short = cosine_topk(
        proj, qp, shortlist_factor * k, id_col=id_col, vec_col="projected"
    )
    ids = [r["vec_id"] for r in short.select("vec_id").collect()]
    cand = emb.filter(F.col(id_col).isin(ids))
    return (
        cosine_scores(cand, query_vec, id_col=id_col, vec_col=vec_col)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
