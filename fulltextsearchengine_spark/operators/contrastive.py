"""Contrastive pair mining for embedding-model training — the
training-data op that turns a search corpus into (anchor, positive,
hard-negative) triplets (the DPR / sentence-transformers recipe:
in-batch easy negatives are free, HARD negatives come from a first-stage
retriever — here, the engine's own BM25).

  anchor    any turn (caller supplies the doc_ids — typically a
            stratified sample);
  positive  the NEXT turn of the same conversation (dialogue adjacency
            as the supervision signal — standard for conversational
            retrievers; anchors ending their conversation are dropped);
  negatives the top BM25 hits for the anchor's own top-m tf-idf terms,
            EXCLUDING the anchor's conversation (lexically similar but
            conversationally unrelated — exactly the "hard" band).

Plan shape: ONE pruned postings point-lookup collects every anchor's
query terms (evaluation.probe_queries), ONE bm25_search_batch job scores
all anchors, one broadcast join against docs tags candidate conv_ids,
and a per-anchor rank window trims to n_neg — every post-retrieval frame
is (anchors × k)-sized, never corpus-sized. The batch k is padded by the
widest conversation so same-conv exclusion can never starve a full
negative set (conv width comes from the tiny conv_ranges table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .evaluation import probe_queries
from .search import Searcher


def contrastive_pairs(
    searcher: Searcher,
    anchor_doc_ids: list[int],
    n_neg: int = 3,
    m_terms: int = 3,
) -> DataFrame:
    """(anchor_doc_id, pos_doc_id, neg_doc_id, neg_rank): n_neg rows per
    anchor that has a next-turn positive; neg_rank 1.. by (BM25 score
    desc, doc_id asc) after exclusions."""
    if not anchor_doc_ids:
        raise ValueError("no anchors given")
    ids = sorted({int(d) for d in anchor_doc_ids})
    docs = searcher.index.docs
    anchors = docs.filter(F.col("doc_id").isin(ids)).select(
        F.col("doc_id").alias("anchor_doc_id"),
        F.col("conv_id").alias("anchor_conv"),
        F.col("turn_idx").alias("anchor_turn"),
    )
    positives = anchors.join(
        docs.select(
            F.col("conv_id").alias("anchor_conv"),
            (F.col("turn_idx") - 1).alias("anchor_turn"),
            F.col("doc_id").alias("pos_doc_id"),
        ),
        ["anchor_conv", "anchor_turn"],
    )

    queries = {
        str(d): q for d, q in probe_queries(searcher, ids, m=m_terms).items() if q
    }
    if not queries:
        return positives.sparkSession.createDataFrame(
            [], "anchor_doc_id long, pos_doc_id long, neg_doc_id long, neg_rank int"
        )
    # pad k so dropping the anchor's whole conversation leaves n_neg rows
    max_conv = int(
        searcher.index.conv_ranges.agg(F.max("n_docs")).collect()[0][0] or 0
    )
    res = searcher.bm25_search_batch(queries, n_neg + max_conv)

    cand = (
        res.select(
            F.col("query_id").cast("long").alias("anchor_doc_id"),
            F.col("doc_id").alias("neg_doc_id"),
            "score",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("neg_doc_id"), F.col("conv_id").alias("neg_conv")
            ),
            "neg_doc_id",
        )
        .join(positives, "anchor_doc_id")
        .filter(F.col("neg_conv") != F.col("anchor_conv"))
    )
    w = Window.partitionBy("anchor_doc_id").orderBy(
        F.desc("score"), F.asc("neg_doc_id")
    )
    return (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= n_neg)
        .select("anchor_doc_id", "pos_doc_id", "neg_doc_id", "neg_rank")
    )
