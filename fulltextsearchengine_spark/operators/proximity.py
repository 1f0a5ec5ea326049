"""Proximity-boosted ranking over the opt-in positional side-table:
BM25 plus a pairwise minimum-distance bonus (the public
Büttcher/Clarke/Lushman SIGIR'06 family, simplified to an additive
1/d² kernel so an ANSI-SQL oracle can replicate it exactly).

    prox(d)  = Σ_{unordered pairs (a,b) of distinct query terms}
                 1 / min_dist(a, b, d)²        (0 if either term absent)
    score(d) = bm25(d) + prox(d)

The reference stores no positions (SURVEY §2.4), so like phrase search
(positions.py) this is flag-gated extension surface over the PARALLEL
``postings_positional`` table — the core index pays nothing.

Plan shape: one pruned ``In(term,…)`` scan of the positional table,
pivot to per-slot position arrays (one doc_id-keyed shuffle — the same
≤|q|-column pivot as every scorer), then the pairwise min-distance is
pure Catalyst array math per row: ``array_min(flatten(transform(pos_a,
a -> transform(pos_b, b -> abs(a−b)))))`` — O(tf_a·tf_b) inside
codegen, no explode, no UDF, no extra shuffle. tf per (term, doc) is
bounded by turn length, so the quadratic term is per-row-constant-ish;
docs missing either term of a pair contribute nothing for that pair.
The bonus frame joins the BM25 candidates on doc_id (bonus docs ⊆
candidates, since a pair needs both terms) and the top-k finishes as
TakeOrderedAndProject.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .search import Searcher, normalize_query


def pairwise_proximity_bonus(
    pos_postings: DataFrame, terms: list[str]
) -> DataFrame:
    """(doc_id, bonus): Σ over unordered distinct-term pairs of
    1/min_dist² — only docs containing ≥2 distinct query terms appear."""
    terms = sorted(set(normalize_query(terms)))
    if len(terms) < 2:
        spark = pos_postings.sparkSession
        return spark.createDataFrame([], "doc_id long, bonus double")
    p = pos_postings.filter(F.col("term").isin(terms))
    piv = p.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("positions"))).alias(f"pos_{i}")
            for i, t in enumerate(terms)
        ]
    )

    def _min_dist(a: Column, b: Column) -> Column:
        return F.array_min(
            F.flatten(F.transform(a, lambda x: F.transform(b, lambda y: F.abs(x - y))))
        )

    bonus = F.lit(0.0)
    for i, j in combinations(range(len(terms)), 2):
        d = _min_dist(F.col(f"pos_{i}"), F.col(f"pos_{j}")).cast("double")
        bonus = bonus + F.coalesce(F.lit(1.0) / (d * d), F.lit(0.0))
    return piv.select("doc_id", bonus.alias("bonus")).filter(F.col("bonus") > 0.0)


def proximity_boosted_scores(
    searcher: Searcher, pos_postings: DataFrame, query: list[str]
) -> DataFrame:
    """(doc_id, score): bm25 + pairwise proximity bonus over the full
    OR-union candidate set (docs with one term keep their plain BM25)."""
    base = searcher.bm25_scores(query)
    bonus = pairwise_proximity_bonus(pos_postings, query)
    return base.join(bonus, "doc_id", "left").select(
        "doc_id",
        (F.col("score") + F.coalesce(F.col("bonus"), F.lit(0.0))).alias("score"),
    )


def proximity_boosted_search(
    searcher: Searcher, pos_postings: DataFrame, query: list[str], k: int = 10
) -> DataFrame:
    """Top-k (score desc, doc_id asc) under the proximity-boosted BM25."""
    return (
        proximity_boosted_scores(searcher, pos_postings, query)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
