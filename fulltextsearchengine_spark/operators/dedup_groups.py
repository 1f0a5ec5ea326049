"""Near-duplicate GROUPING: turn pairwise candidates (from MinHash-LSH /
SimHash / embedding near-dup) into connected components and pick one
canonical document per component — the step that actually SHRINKS a
training corpus (pairs alone don't say which copy to keep).

Algorithm: iterative min-label propagation over the symmetrized pair
graph. Each round every node takes the min of its own label and its
neighbors' labels; converges when no label changes (fixed point = every
node holds the min doc_id of its component — the deterministic,
engine-independent group id).

Scale shape: near-dup graphs are unions of small dense clusters (LSH
pairs within a duplicate family form near-cliques), so the diameter —
and the round count — is tiny (1–3). Each round is one shuffle join on
the edge list; labels are ``localCheckpoint``-ed per round so the loop's
lineage (and thus task-retry cost) stays O(1) instead of O(rounds). For
adversarially long chain components at 10^12-doc scale, swap the
propagation loop for the large-star/small-star edge-rewriting scheme
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014) — O(log n) rounds with bounded skew; the output contract
(node → component-min doc_id) is identical, which the oracle pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, group_id) for every node appearing in ``pairs``;
    group_id = min doc_id reachable in the pair graph."""
    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    sym = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_min"), F.col("label")) < F.col("label")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint()
        )
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("group_id"))


def dedup_groups(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", max_iter: int = 50
) -> DataFrame:
    """(doc_id, group_id) for EVERY document: component-min doc_id for
    docs in a near-dup component, own doc_id for singletons. One
    broadcast-sized join against the component labels (the label table
    is |docs-in-pairs| rows — far smaller than the corpus)."""
    comp = connected_components(pairs, max_iter=max_iter)
    return docs.select(id_col).join(
        comp, docs[id_col] == comp["node"], "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("group_id"), F.col(id_col)).alias("group_id"),
    )


def dedup_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
    score_col: str | None = None,
) -> DataFrame:
    """The deduplicated corpus: keep exactly one document per near-dup
    component. Pick rule: highest ``score_col`` (quality-weighted —
    keep the BEST copy, not an arbitrary one), ties and the default
    ``score_col=None`` falling back to min doc_id. Singletons pass
    through untouched.

    The argmax is ``max_by`` over a (score, -doc_id) struct inside the
    per-group aggregate — one extra shuffle on group_id over only the
    grouped docs (the label table is |docs-in-pairs| rows, tiny next to
    the corpus)."""
    groups = dedup_groups(docs, pairs, id_col=id_col, max_iter=max_iter)
    if score_col is None:
        keep = groups.where(F.col(id_col) == F.col("group_id")).select(id_col)
    else:
        keep = (
            docs.select(id_col, score_col)
            .join(groups, id_col)
            .groupBy("group_id")
            .agg(
                F.max_by(
                    F.col(id_col), F.struct(F.col(score_col), -F.col(id_col))
                ).alias(id_col)
            )
            .select(id_col)
        )
    return docs.join(keep, id_col, "inner")


def soft_dedup_weights(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", max_iter: int = 50
) -> DataFrame:
    """(doc_id, group_id, group_size, weight_micro): SOFT dedup — keep
    every document but downweight duplicates by their near-dup family
    size, weight = 1/|component| (singletons keep 1.0). The sampling /
    loss-reweighting alternative to ``dedup_canonical`` when hard
    removal is too aggressive (e.g. SlimPajama-style pipelines keep
    one weighted epoch's worth of each duplicate family rather than
    betting on a single canonical copy).

    Scale shape: the group-size table has ~one row per DOCUMENT
    (every singleton is its own group), so it must never be broadcast
    or re-joined — a single window count over the group_id partition
    gets size and weight in ONE shuffle of the label table.
    weight_micro = round(1e6 / size) — integer arithmetic,
    engine-independent."""
    from pyspark.sql import Window

    groups = dedup_groups(docs, pairs, id_col=id_col, max_iter=max_iter)
    size = F.count("*").over(Window.partitionBy("group_id"))
    return groups.select(
        id_col,
        "group_id",
        size.cast("long").alias("group_size"),
        F.round(F.lit(1e6) / size).cast("long").alias("weight_micro"),
    )
