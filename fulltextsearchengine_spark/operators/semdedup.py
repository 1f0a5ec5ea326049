"""SemDeDup — semantic deduplication over embedding space (Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023) plus the cluster-prototypicality pruning metric
(Sorscher et al., "Beyond neural scaling laws", NeurIPS 2022).

The published SemDeDup recipe is exactly a composition of operators
this engine already has, which is why it lives here as a thin layer:

  1. k-means the embedding corpus (``clustering.kmeans_fit`` — the
     deterministic distributed Lloyd).
  2. WITHIN each cluster, find pairs with cosine ≥ τ ("semantic
     duplicates") — the cluster bound is the whole point: cost is
     Σ|cluster|², and k is chosen to hold clusters near-constant size
     (the paper runs k=110k on LAION), so the quadratic never sees the
     corpus, only a cluster.
  3. Group duplicates (connected components, ``dedup_groups``) and
     keep ONE per group — the member with the LOWEST cosine to its
     cluster centroid (the paper's best-performing keep rule: retain
     the least prototypical example), ties to the lowest vec_id.

``prototypicality`` exposes step 3's ranking signal on its own:
cosine-to-own-centroid, the Sorscher et al. pruning metric (drop the
most prototypical examples first when pruning an over-sampled corpus).

Determinism/oracle contract: centroids come from the quantized Lloyd
fit (bit-identical to the unrolled-CTE twin), cosines are JVM
left-to-right folds rounded to micro ints, and the keep rule compares
micro ints — every stage hashes identically across engines.

Scale shape: assignment + centroid-cosine is one broadcast join (k
rows) over the corpus; the pair join shuffles once on cluster id; the
component/keep stage runs on pair-touched vectors only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import kmeans_assign, kmeans_fit
from .dedup_groups import connected_components
from .similarity import _dot, _norm


def _centroids_df(spark, centroids: np.ndarray) -> DataFrame:
    rows = [
        (int(cid), [float(x) for x in vec]) for cid, vec in enumerate(centroids)
    ]
    return spark.createDataFrame(rows, "cluster long, centroid array<double>")


def prototypicality(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, proto_micro): cosine of each vector to its own
    cluster centroid, micro-rounded — high = prototypical (prune first
    per Sorscher et al. when the corpus is over-sampled), low = the
    example SemDeDup keeps from a duplicate group."""
    assigned = kmeans_assign(embeddings, centroids, id_col, vec_col)
    cdf = F.broadcast(_centroids_df(embeddings.sparkSession, centroids))
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    return (
        assigned.join(e, "vec_id")
        .join(cdf, "cluster")
        .select(
            "vec_id",
            "cluster",
            F.round(
                _dot(F.col("v"), F.col("centroid"))
                / (_norm(F.col("v")) * _norm(F.col("centroid")))
                * 1e6
            )
            .cast("long")
            .alias("proto_micro"),
        )
    )


def semdedup_pairs(
    embeddings: DataFrame,
    assignments: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, cos_micro), vec_a < vec_b: within-cluster pairs
    with cosine ≥ τ. The self-join is keyed by cluster id — the
    corpus-level quadratic is cut to Σ|cluster|²."""
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).join(assignments, "vec_id")
    a = e.select(
        F.col("cluster"), F.col("vec_id").alias("vec_a"), F.col("v").alias("va")
    )
    b = e.select(
        F.col("cluster"), F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cos * 1e6).cast("long").alias("cos_micro"),
        )
        .filter(F.col("cos_micro") >= int(round(tau * 1e6)))
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int,
    tau: float,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, proto_micro, kept): the SemDeDup verdict for
    every vector — ``kept`` false iff the vector is in a duplicate
    component and is not its keeper (lowest proto_micro, then lowest
    vec_id). Filter on ``kept`` for the deduplicated corpus; the full
    table is emitted so the drop decision is auditable."""
    cent = kmeans_fit(embeddings, k, n_iters, id_col, vec_col)
    assigned = kmeans_assign(embeddings, cent, id_col, vec_col)
    proto = prototypicality(embeddings, cent, id_col, vec_col)
    pairs = semdedup_pairs(embeddings, assigned, tau, id_col, vec_col)
    comp = connected_components(pairs, a_col="vec_a", b_col="vec_b")
    labeled = proto.join(comp, proto["vec_id"] == comp["node"], "left").select(
        proto["vec_id"], "cluster", "proto_micro", F.col("group_id")
    )
    keepers = (
        labeled.filter(F.col("group_id").isNotNull())
        .groupBy("group_id")
        .agg(
            F.min_by(
                F.col("vec_id"),
                F.struct(F.col("proto_micro"), F.col("vec_id")),
            ).alias("keeper")
        )
    )
    return (
        labeled.join(keepers, "group_id", "left")
        .select(
            "vec_id",
            "cluster",
            "proto_micro",
            (
                F.col("group_id").isNull()
                | (F.col("vec_id") == F.col("keeper"))
            ).alias("kept"),
        )
    )
