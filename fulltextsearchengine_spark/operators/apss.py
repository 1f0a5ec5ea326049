"""All-pairs sparse similarity (APSS) over tf-idf document vectors —
find every document pair whose cosine similarity meets a threshold,
using the inverted index itself as the similarity engine.

The reference has no pair-similarity surface (its query side is the
three scorers, ReviewSearch.java); this is the classic training-data
near-duplicate / template-detection primitive that complements the
signature-based paths (MinHash/SimHash in dedup.py): those bound
*Jaccard/Hamming*; APSS is EXACT cosine over the same tf-idf geometry
the ranker scores with, so "what the ranker considers near-identical"
is answered in the ranker's own metric.

Algorithm — Bayardo/Ma/Srikant prefix filtering (WWW'07, "Scaling Up
All Pairs Similarity Search"), re-expressed as two DataFrame joins:

  1. L2-normalize per-doc tf-idf vectors V(doc, term, w).
  2. mw(term) = corpus max of w — vocabulary-sized, broadcastable.
  3. Within each doc, order terms hot-first (df desc, term asc) and
     take the running bound  cum_i = Σ_{j≤i} w_j · mw(term_j).
     A term is INDEXED iff cum_i ≥ t.  If every term two docs share
     lies in one doc's unindexed prefix, their dot product is
     ≤ that prefix's cum < t; contrapositive: every qualifying pair
     shares at least one term indexed in at least ONE member.
     Candidate generation therefore joins V_indexed ⋈ V_full (NOT
     indexed⋈indexed, which would require the shared term indexed in
     both and lose pairs) and canonicalizes — recall-complete by the
     bound, while the indexed side carries each hot term only for the
     few docs whose bound forces it to stay indexed.
  4. Verify candidates with the exact dot product (P ⋈ V ⋈ V on the
     pair's own rows only) and keep cos ≥ t.

100-TB plan shape: the candidate join shuffles on term once; hot terms
are mostly UNINDEXED (hot-first ordering pushes them under the bound),
which is the skew defense — the classic all-pairs self-join explodes
exactly on those terms. mw and per-term df ride along from the
vocabulary-sized terms table (AQE broadcasts). Verification touches
only candidate pairs' rows: shuffle keyed by doc_id, proportional to
survivors, not to corpus². ``exact_baseline=True`` keeps the naive
self-join for oracles/tests (same contract as similarity.py's
emb_near_pairs exact path).

Scores are emitted as integer micro-cosines (``cos_micro``) so ranks
and gate hashes are reproducible across engines (keywords.py contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .index_build import InvertedIndex


def tfidf_vectors(index: InvertedIndex) -> DataFrame:
    """(doc_id, term, w): L2-normalized tf-idf, w = tf·ln(N/df) / ‖d‖.

    Docs whose every term appears in every doc (norm 0 — idf all zero)
    are dropped: they have no direction in tf-idf space.
    """
    n_docs = F.lit(int(index.stats_row()["num_docs"]))
    raw = (
        index.postings.select("term", "doc_id", "tf")
        .join(index.terms.select("term", "df"), "term")
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(n_docs / F.col("df"))).alias("w_raw"),
        )
    )
    norms = raw.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw"))).alias("norm")
    )
    return (
        raw.join(norms, "doc_id")
        .filter(F.col("norm") > 0)
        .select("doc_id", "term", (F.col("w_raw") / F.col("norm")).alias("w"))
    )


def _exact_pairs(vecs: DataFrame, threshold: float) -> DataFrame:
    """Naive exact all-pairs: self-join on term. Quadratic on hot terms
    — the oracle/test baseline, not the scale path."""
    a = vecs.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa")
    )
    b = vecs.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    )
    return (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")) * 1e6).cast("long").alias("cos_micro"))
        .filter(F.col("cos_micro") >= F.round(F.lit(threshold) * 1e6).cast("long"))
    )


def sparse_cosine_pairs(
    index: InvertedIndex,
    threshold: float,
    exact_baseline: bool = False,
    persist: bool = True,
    persist_handles: list | None = None,
) -> DataFrame:
    """(doc_a, doc_b, cos_micro), doc_a < doc_b, cosine ≥ threshold —
    exact result set either way; ``exact_baseline`` only switches the
    candidate-generation strategy (naive self-join vs prefix filter).

    ``persist``: the normalized-vector frame feeds FOUR plan consumers
    (max-weight meta, the flagging window, both verify sides) and the
    flagged frame two (indexed/full) — without persistence Spark
    recomputes the postings⋈terms⋈norm subtree for each (differently
    aliased projections defeat ReusedExchange), measured 3× slower at
    1500 docs. Both frames are O(corpus postings): MEMORY_AND_DISK
    persist, spilling like any shuffle would; pass ``persist=False``
    for one-shot plans where the caller manages caching.

    ``persist_handles``: optional list the persisted frames are appended
    to, so long-lived sessions can ``unpersist()`` them after the
    consuming action instead of accumulating MEMORY_AND_DISK cache
    across repeated calls (ADVICE r3). Without it, persisted frames
    live until ``spark.catalog.clearCache()`` / session end."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    vecs = tfidf_vectors(index)
    if persist:
        vecs = vecs.persist()
        if persist_handles is not None:
            persist_handles.append(vecs)
    if exact_baseline:
        return _exact_pairs(vecs, threshold)

    # per-term corpus max weight + df (vocabulary-sized; broadcast join)
    term_meta = vecs.groupBy("term").agg(F.max("w").alias("mw"))
    with_meta = vecs.join(F.broadcast(term_meta), "term").join(
        F.broadcast(index.terms.select("term", "df")), "term"
    )
    # hot-first running bound within each doc; indexed iff cum ≥ t
    w_order = Window.partitionBy("doc_id").orderBy(F.desc("df"), F.asc("term"))
    cum = F.sum(F.col("w") * F.col("mw")).over(
        w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = with_meta.select(
        "doc_id", "term", "w", (cum >= F.lit(threshold)).alias("indexed")
    )
    if persist:
        flagged = flagged.persist()
        if persist_handles is not None:
            persist_handles.append(flagged)
    indexed = flagged.filter("indexed").select(F.col("doc_id").alias("di"), "term")
    full = flagged.select(F.col("doc_id").alias("df_"), "term")

    # recall-complete candidates: a qualifying pair shares ≥1 term
    # indexed in at least one member → indexed ⋈ full catches both
    # orientations; canonicalize and dedup
    cands = (
        indexed.join(full, "term")
        .filter(F.col("di") != F.col("df_"))
        .select(
            F.least("di", "df_").alias("doc_a"),
            F.greatest("di", "df_").alias("doc_b"),
        )
        .distinct()
    )

    # exact verification over candidate pairs only
    va = vecs.select(F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa"))
    vb = vecs.select(F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb"))
    return (
        cands.join(va, "doc_a")
        .join(vb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")) * 1e6).cast("long").alias("cos_micro"))
        .filter(F.col("cos_micro") >= F.round(F.lit(threshold) * 1e6).cast("long"))
    )
