"""rank_feature scoring: boost relevance by a static per-document
numeric feature (the public Elasticsearch `rank_feature` query /
Lucene FeatureField semantics).

The reference engine ranks on text statistics alone
(ReviewSearch.java); production serving almost always folds in a
query-independent document prior — pagerank, click count, length,
freshness rank. ES models this as a `bool` query whose `should` clause
adds a monotone transform of the feature S to the text score:

    score(d) = text_score(d) + boost · f(S_d)

    f_saturation(S) = S / (S + pivot)                 (default in ES)
    f_log(S)        = ln(scaling_factor + S)
    f_sigmoid(S)    = S^exp / (S^exp + pivot^exp)

Features must be non-negative (ES rejects negative values at index
time — we raise at query time); documents MISSING the feature
contribute 0 for the clause, exactly like a `should` term that does
not match. ES derives a default `pivot` from index statistics; here
the caller passes it explicitly so results are reproducible across
engines (the DuckDB twin computes the identical expression).

Plan shape: the candidate-sized score frame (any scorer — BM25, msm,
boolean, filtered — via the ``scores=`` hook, the recency.py pattern)
left-joins the feature table on doc_id (candidates ⊆ corpus, so Spark
broadcasts the small scored side), then one scalar expression and the
usual TakeOrderedAndProject. The underlying pruned-pivot text plan is
untouched — the feature multiplies AFTER aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .search import Searcher

RANK_FEATURE_FUNCTIONS = ("saturation", "log", "sigmoid")


def _feature_transform(
    s: Column,
    function: str,
    pivot: float,
    exponent: float,
    scaling_factor: float,
) -> Column:
    if function == "saturation":
        return s / (s + F.lit(float(pivot)))
    if function == "log":
        return F.log(F.lit(float(scaling_factor)) + s)
    if function == "sigmoid":
        p = F.pow(s, F.lit(float(exponent)))
        return p / (p + F.lit(float(pivot) ** float(exponent)))
    raise ValueError(
        f"function must be one of {RANK_FEATURE_FUNCTIONS}, got {function!r}"
    )


def rank_feature_scores(
    searcher: Searcher,
    features: DataFrame,
    query: list[str] | None = None,
    function: str = "saturation",
    pivot: float = 1.0,
    boost: float = 1.0,
    exponent: float = 2.0,
    scaling_factor: float = 1.0,
    scores: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, score): text score + boost·f(feature).

    ``features``: (doc_id, feature) with feature ≥ 0 (double-castable);
    docs absent from it (or with NULL feature) add 0. ``scores``:
    optional pre-scored (doc_id, score) frame instead of plain BM25 —
    exactly one of ``query``/``scores`` (the recency.py contract).
    """
    if (query is None) == (scores is None):
        raise ValueError("pass exactly one of query= / scores=")
    if function in ("saturation", "sigmoid") and pivot <= 0:
        raise ValueError(f"pivot must be > 0, got {pivot}")
    if function == "sigmoid" and exponent <= 0:
        raise ValueError(f"exponent must be > 0, got {exponent}")
    if function == "log" and scaling_factor <= 0:
        raise ValueError(f"scaling_factor must be > 0, got {scaling_factor}")
    base = scores if scores is not None else searcher.bm25_scores(query)
    feat = features.select(
        "doc_id", F.col("feature").cast("double").alias("_rf_s")
    )
    s = F.col("_rf_s")
    contrib = F.when(
        s.isNotNull() & (s >= 0),
        F.lit(float(boost))
        * _feature_transform(s, function, pivot, exponent, scaling_factor),
    ).otherwise(F.lit(0.0))
    joined = base.join(feat, "doc_id", "left")
    # negative features are a data bug, not a ranking choice — surface it
    neg_guard = F.when(
        s.isNotNull() & (s < 0),
        F.raise_error(F.lit("rank_feature: negative feature value")),
    ).otherwise(contrib)
    return joined.select(
        "doc_id", (F.col("score") + neg_guard).alias("score")
    )


def rank_feature_search(
    searcher: Searcher,
    features: DataFrame,
    query: list[str] | None = None,
    k: int = 10,
    function: str = "saturation",
    pivot: float = 1.0,
    boost: float = 1.0,
    exponent: float = 2.0,
    scaling_factor: float = 1.0,
    scores: DataFrame | None = None,
) -> DataFrame:
    """Top-k by feature-boosted score: score desc, doc_id asc
    (TakeOrderedAndProject, the house top-k shape)."""
    return Searcher.topk(
        rank_feature_scores(
            searcher,
            features,
            query=query,
            function=function,
            pivot=pivot,
            boost=boost,
            exponent=exponent,
            scaling_factor=scaling_factor,
            scores=scores,
        ),
        k,
    )
