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
lineage (and thus task-retry cost) stays O(1) instead of O(rounds).

Two algorithms behind one contract (``algorithm=`` on every entry
point; the output — node → component-min doc_id — is identical and the
same DuckDB oracle pins both):

* ``"propagation"`` (default): iterative min-label propagation,
  O(diameter) rounds. Optimal for the near-clique dup families LSH
  emits (1–3 rounds), degenerate on chain-shaped graphs.
* ``"star"``: the alternating large-star/small-star edge-rewriting
  scheme (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC 2014) — O(log² n) rounds regardless of diameter, with
  per-round skew bounded by the star-rewrite itself. The fallback for
  adversarially chain-shaped components at 10^12-doc scale (pytest
  pins a 10k-node chain: propagation is still wrong after 20 rounds,
  star converges in ~⌈log₂⌉+ a few).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_components(
    edges: DataFrame, max_iter: int, rounds_out: list | None
) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al. 2014 §3).

    large-star(u): every neighbor v > u re-attaches to
    m = min(Γ(u) ∪ {u}); small-star(u) (edges oriented high→low):
    every neighbor re-attaches to m. The fixed point is a star per
    component rooted at its min node; each round is two self-joins on
    the (shrinking) edge list, ``localCheckpoint``-ed so lineage stays
    O(1). Returns (node, group_id) for every node of ``edges``."""
    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # canonical high→low orientation, self-loops dropped
    cur = (
        edges.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # ---- large-star: neighborhoods over BOTH directions ----------
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star: edges already oriented u > v -----------------
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        joined = large.join(smins, "u")
        small = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(joined.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # converged when the edge set is a fixed point (both are
        # distinct sets, so equal counts + empty difference ⇒ equal)
        if (
            small.count() == cur.count()
            and small.exceptAll(cur).limit(1).count() == 0
        ):
            cur = small
            break
        cur = small
    if rounds_out is not None:
        rounds_out.append(rounds)
    # fixed point is a star per component: u > v ⇒ v is the root =
    # component min; roots (and isolated nodes) label themselves
    root_of = cur.groupBy("u").agg(F.min("v").alias("root"))
    return nodes.join(root_of, nodes["node"] == root_of["u"], "left").select(
        "node", F.coalesce(F.col("root"), F.col("node")).alias("group_id")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
    algorithm: str = "propagation",
    rounds_out: list | None = None,
) -> DataFrame:
    """(node, group_id) for every node appearing in ``pairs``;
    group_id = min doc_id reachable in the pair graph.

    ``algorithm``: "propagation" (O(diameter) rounds — the near-clique
    default) or "star" (Kiveris et al. large-star/small-star,
    O(log² n) rounds — the adversarial-diameter fallback). Same output
    either way. ``rounds_out``: optional list; the round count used is
    appended (observability + the convergence pytest)."""
    if algorithm not in ("propagation", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}: use 'propagation' or 'star'")
    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    if algorithm == "star":
        return _star_components(edges, max_iter, rounds_out)
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
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
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
    if rounds_out is not None:
        rounds_out.append(rounds)
    return labels.select(F.col("node"), F.col("label").alias("group_id"))


def dedup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
    algorithm: str = "propagation",
) -> DataFrame:
    """(doc_id, group_id) for EVERY document: component-min doc_id for
    docs in a near-dup component, own doc_id for singletons. One
    broadcast-sized join against the component labels (the label table
    is |docs-in-pairs| rows — far smaller than the corpus)."""
    comp = connected_components(pairs, max_iter=max_iter, algorithm=algorithm)
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
    algorithm: str = "propagation",
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
    groups = dedup_groups(
        docs, pairs, id_col=id_col, max_iter=max_iter, algorithm=algorithm
    )
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
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
    algorithm: str = "propagation",
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

    groups = dedup_groups(
        docs, pairs, id_col=id_col, max_iter=max_iter, algorithm=algorithm
    )
    size = F.count("*").over(Window.partitionBy("group_id"))
    return groups.select(
        id_col,
        "group_id",
        size.cast("long").alias("group_size"),
        F.round(F.lit(1e6) / size).cast("long").alias("weight_micro"),
    )
