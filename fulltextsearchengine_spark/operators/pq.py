"""Product quantization (PQ) for embedding ANN at 100-TB scale
(Jégou, Douze & Schmid 2011 — the IVF-PQ layout of FAISS).

int8 quantization (similarity.quantize_embeddings) buys 4×; PQ buys
dim·4/m bytes-per-vector (64-dim float32 → 16 one-byte codes = 16×),
which at 10^12 vectors is the difference between an ANN candidate
stage that streams from page cache and one that reads cold storage.
The asymmetric-distance (ADC) scan never reconstructs vectors: one
m×n_codes lookup table per query, one table-lookup-and-add per code.

Pipeline (all deterministic, seeded):
  train   per-subspace Lloyd k-means on a driver-side sample
          (``pq_train_codebooks`` — the ivf_train_centroids contract;
          k-means quality is pinned by a pytest recall bound, not the
          cross-engine gate)
  encode  codes[v][m] = argmin_c ||v_m − cb[m][c]||² over unit-normed
          vectors, ties → lowest code (``pq_encode``, Arrow-batched
          matmul; the 100-TB job writes this ONCE next to the vectors)
  query   ADC: LUT[m][c] = q_m · cb[m][c]; score = Σ_m LUT[m][code_m]
          (``pq_adc_topk`` — approximate dot ≈ cosine on unit vectors)

The cross-engine gate runs encode+ADC with ``pq_seeded_codebooks``
(config-not-data, embedded as SQL literals — the synonym-gate pattern),
which checks the arithmetic exactly for arbitrary codebooks; trained
codebooks go through the same code path.

Composes with IvfAnnIndex: partition the codes table by the coarse
centroid and ADC-scan only the probed partitions (IVF-PQ).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PQ_M = 16
PQ_CODES = 16


def _unit_rows(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


def pq_train_codebooks(
    embeddings: DataFrame,
    dim: int,
    m: int = PQ_M,
    n_codes: int = PQ_CODES,
    sample_size: int = 10_000,
    n_iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, n_codes, dim//m) float64 codebooks: per-subspace Lloyd
    k-means over a unit-normalized driver sample."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    sample = np.stack(
        [
            np.asarray(r[vec_col], dtype=np.float64)
            for r in embeddings.limit(sample_size).collect()
        ]
    )
    sample = _unit_rows(sample)
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, sub))
    for j in range(m):
        block = sample[:, j * sub : (j + 1) * sub]
        cent = block[rng.choice(len(block), size=min(n_codes, len(block)), replace=False)]
        for _ in range(n_iters):
            d = (
                (block * block).sum(axis=1)[:, None]
                - 2.0 * block @ cent.T
                + (cent * cent).sum(axis=1)[None, :]
            )
            assign = np.argmin(d, axis=1)
            for c in range(len(cent)):
                members = block[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j, : len(cent)] = cent
        if len(cent) < n_codes:  # degenerate tiny sample: pad by repeat
            books[j, len(cent) :] = cent[-1]
    return books


def pq_seeded_codebooks(
    dim: int, m: int = PQ_M, n_codes: int = PQ_CODES, seed: int = 7
) -> np.ndarray:
    """Data-independent Gaussian codebooks (config, not training) — the
    cross-engine gate variant: exercises encode+ADC arithmetic exactly
    without putting k-means inside a SQL twin."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, n_codes, dim // m)) * (1.0 / np.sqrt(dim))


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>): per-subspace nearest code over the
    unit-normalized vector, expanded-form L2 (||x||² − 2x·c + ||c||²,
    the same formula the SQL twin runs), ties → lowest code via
    np.argmin. Arrow-batched matmul per subspace; zero shuffles — at
    scale this is a projection written alongside the vector table."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, _, sub = books.shape

    def encode(batches):
        for pdf in batches:
            mat = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                block = mat[:, j * sub : (j + 1) * sub]
                cb = books[j]
                d = (
                    (block * block).sum(axis=1)[:, None]
                    - 2.0 * block @ cb.T
                    + (cb * cb).sum(axis=1)[None, :]
                )
                codes[:, j] = np.argmin(d, axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col], "codes": list(codes)})

    return embeddings.mapInPandas(encode, schema="vec_id long, codes array<int>")


def pq_adc_topk(
    codes: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, adc) top-k by asymmetric-distance dot: the query is NOT
    quantized — LUT[m][c] = q̂_m · cb[m][c] is built once driver-side
    (m·n_codes floats) and closed over the Arrow scan; each corpus code
    row costs m lookups + adds, accumulated in subspace order
    (reproducible float sum). Order (adc desc, vec_id asc)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, _, sub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    lut = np.stack([books[j] @ q[j * sub : (j + 1) * sub] for j in range(m)])

    def score(batches):
        for pdf in batches:
            cm = np.stack(pdf["codes"].to_numpy())
            s = np.zeros(len(cm))
            for j in range(m):  # sequential per-subspace accumulation
                s = s + lut[j][cm[:, j]]
            yield pd.DataFrame({"vec_id": pdf[id_col], "adc": s})

    scored = codes.mapInPandas(score, schema="vec_id long, adc double")
    return scored.orderBy(F.desc("adc"), F.asc("vec_id")).limit(k)


class IvfPqIndex:
    """IVF-PQ: the canonical billion-to-trillion-vector ANN layout
    (FAISS IndexIVFPQ) — coarse k-means partitions + PQ codes INSIDE
    each partition, persisted as parquet partitionBy(centroid).

    Query cost at 10^12 vectors: read n_probe/n_centroids of a codes
    table that is already dim·4/m× smaller than the vectors (×16 at
    64-dim, m=16) — the scan is ~n_probe·avg_list·m bytes; the optional
    exact re-rank touches only ``refine`` float vectors by id (pruned
    point lookups). Both quantizers train on driver-side samples
    (seeded — the ivf_train_centroids contract); codes are written once
    at build, appended per wave via the standing quantizers
    (``append``, the IvfAnnIndex.append analog)."""

    META = "_ivfpq_meta.json"

    def __init__(self, spark, path: str, meta: dict):
        self.spark, self.path, self.meta = spark, path, meta
        self.centroids = np.asarray(meta["centroids"], dtype=np.float64)
        self.codebooks = np.asarray(meta["codebooks"], dtype=np.float64)

    @classmethod
    def build(
        cls,
        embeddings: DataFrame,
        path: str,
        dim: int,
        n_centroids: int = 16,
        m: int = PQ_M,
        n_codes: int = PQ_CODES,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfPqIndex":
        import json
        import os

        from .similarity import ivf_assign, ivf_train_centroids

        cent = ivf_train_centroids(
            embeddings, n_centroids=n_centroids, dim=dim, seed=seed, vec_col=vec_col
        )
        books = pq_train_codebooks(
            embeddings, dim, m=m, n_codes=n_codes, seed=seed, vec_col=vec_col
        )
        codes = pq_encode(embeddings, books, id_col=id_col, vec_col=vec_col)
        assigned = ivf_assign(embeddings, cent, id_col=id_col, vec_col=vec_col)
        codes.join(assigned, "vec_id").write.partitionBy("centroid").mode(
            "overwrite"
        ).parquet(path)
        meta = {
            "dim": dim,
            "id_col": id_col,
            "vec_col": vec_col,
            "centroids": [r.tolist() for r in cent],
            "codebooks": [[c.tolist() for c in b] for b in books],
        }
        with open(os.path.join(path, cls.META), "w") as f:
            json.dump(meta, f)
        return cls(embeddings.sparkSession, path, meta)

    @classmethod
    def load(cls, spark, path: str) -> "IvfPqIndex":
        import json
        import os

        with open(os.path.join(path, cls.META)) as f:
            return cls(spark, path, json.load(f))

    def append(self, new_embeddings: DataFrame) -> "IvfPqIndex":
        """Incremental wave through the STANDING quantizers (centroids
        and codebooks fixed; retrain = rebuild, only on drift)."""
        from .similarity import ivf_assign

        codes = pq_encode(
            new_embeddings,
            self.codebooks,
            id_col=self.meta["id_col"],
            vec_col=self.meta["vec_col"],
        )
        assigned = ivf_assign(
            new_embeddings,
            self.centroids,
            id_col=self.meta["id_col"],
            vec_col=self.meta["vec_col"],
        )
        codes.join(assigned, "vec_id").write.partitionBy("centroid").mode(
            "append"
        ).parquet(self.path)
        return self

    def topk(
        self,
        query_vec: list[float],
        k: int,
        n_probe: int = 4,
        refine: int = 0,
        embeddings: DataFrame | None = None,
    ) -> DataFrame:
        """ADC top-k over the probed partitions. ``refine`` > 0 re-ranks
        the ADC top-``refine`` exactly against the float vectors
        (pruned id point-lookups on ``embeddings``) and returns cosine
        top-k — the standard two-stage precision recovery."""
        if refine > 1_000_000:
            # top-k materializes a k-sized bounded heap PER PARTITION —
            # a sentinel like 10^9 OOMs the executors, it doesn't mean
            # "all". For an exact full scan use similarity.cosine_topk.
            raise ValueError(f"refine={refine} is not a serving-sized re-rank")
        q = np.asarray(query_vec, dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-12)
        probe = np.argsort(-(self.centroids @ qn))[:n_probe].tolist()
        codes = self.spark.read.parquet(self.path).filter(
            F.col("centroid").isin(probe)
        )
        if not refine:
            return pq_adc_topk(
                codes, query_vec, self.codebooks, k, id_col="vec_id"
            )
        if embeddings is None:
            raise ValueError("refine > 0 requires the float `embeddings` frame")
        from .similarity import cosine_topk

        cand = pq_adc_topk(
            codes, query_vec, self.codebooks, max(refine, k), id_col="vec_id"
        ).select("vec_id")
        survivors = embeddings.join(
            F.broadcast(cand),
            embeddings[self.meta["id_col"]] == cand["vec_id"],
            "left_semi",
        )
        return cosine_topk(
            survivors,
            query_vec,
            k,
            id_col=self.meta["id_col"],
            vec_col=self.meta["vec_col"],
        )
