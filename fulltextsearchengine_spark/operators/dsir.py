"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023) over hashed n-gram features, Spark-first.

The published recipe, which is counting end-to-end and therefore maps
onto three shuffles total:

1. **Features**: each document is a bag of hashed n-grams (unigrams +
   bigrams here, like the paper) bucketed into ``n_buckets``.
2. **Fit**: bag-of-words models of the *target* corpus (the trusted
   slice you want more of) and the *raw* corpus, per bucket, add-one
   smoothed; the per-bucket log importance ratio is
   ``ln p_target(b) − ln p_raw(b)``.
3. **Weigh + resample**: a document's log importance weight is
   ``Σ_b f_b · λ_b``; sampling without replacement uses the Gumbel
   top-k trick on ``log w + Gumbel(0,1)`` — here with *deterministic*
   Gumbel noise derived from ``md5(seed, doc_id)``, so the sample is
   reproducible across engines and runs (no ``rand()``).

Hash = first 8 hex chars of md5 → uint32 → ``% n_buckets`` — the same
cross-engine-stable trick as SimHash (dedup.py:187-196); murmur-class
speed is irrelevant next to the shuffle, and md5 exists identically in
DuckDB for the oracle.

Scale shape (100-TB contract): features are a token-level explode
pre-aggregated per (doc, bucket) — the postings shape — with one
map-side-combined shuffle; both fits reduce to ``n_buckets`` rows
(tiny, broadcast from then on); weighing is a broadcast join + one
doc-keyed agg; resampling is a global TakeOrdered(n). The raw corpus
is scanned twice (fit + weigh) and never shuffled whole.

The reference engine has no data-selection surface; this extends the
beyond-reference training-data pipeline (COVERAGE.md addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col

DSIR_DEFAULT_BUCKETS = 10_000


def _bucket(col):
    """md5-hash a string column into a stable uint32."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hashed_ngram_features(
    docs: DataFrame,
    n_buckets: int = DSIR_DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, bucket, c): hashed unigram+bigram counts per document.

    Unigrams and bigrams share the bucket space (paper's setup); the
    bigram feature string is ``w1 ' ' w2`` — cannot collide with a
    unigram, which never contains a space.
    """
    toks = tokens_col(F.col(text_col))
    t = docs.select(F.col(id_col), toks.alias("toks"))
    m = F.greatest(F.size(F.col("toks")) - 1, F.lit(0))
    grams = t.select(
        id_col,
        F.explode(
            F.concat(
                F.col("toks"),
                F.zip_with(
                    F.slice("toks", 1, m),
                    F.slice("toks", 2, m),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            )
        ).alias("gram"),
    )
    return (
        grams.select(id_col, (_bucket(F.col("gram")) % n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_fit(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = DSIR_DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    raw_features: DataFrame | None = None,
    target_features: DataFrame | None = None,
) -> DataFrame:
    """Per-bucket log importance ratio λ_b (only buckets observed in
    at least one corpus — absent buckets' λ is irrelevant because no
    document can carry them as a feature).

    Returns (bucket, target_c, raw_c, log_ratio) with add-one
    smoothing: λ_b = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B)).

    ``raw_features`` / ``target_features``: precomputed
    ``hashed_ngram_features`` output (MUST be the same ``n_buckets``).
    At 100 TB the raw corpus is featurized once, persisted, and shared
    between this fit and ``dsir_log_weights`` — passing it here avoids
    the second full-corpus scan.
    """

    def corpus_counts(
        d: DataFrame, feats: DataFrame | None, name: str
    ) -> DataFrame:
        if feats is None:
            feats = hashed_ngram_features(d, n_buckets, text_col, id_col)
        return feats.groupBy("bucket").agg(F.sum("c").alias(name))

    tc = corpus_counts(target, target_features, "target_c")
    rc = corpus_counts(raw, raw_features, "raw_c")
    tot = tc.agg(F.coalesce(F.sum("target_c"), F.lit(0))).collect()[0][0]
    rot = rc.agg(F.coalesce(F.sum("raw_c"), F.lit(0))).collect()[0][0]
    joined = tc.join(rc, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("target_c", F.lit(0)).cast("long").alias("target_c"),
        F.coalesce("raw_c", F.lit(0)).cast("long").alias("raw_c"),
    )
    return joined.withColumn(
        "log_ratio",
        F.log((F.col("target_c") + 1) / F.lit(float(tot + n_buckets)))
        - F.log((F.col("raw_c") + 1) / F.lit(float(rot + n_buckets))),
    )


def dsir_log_weights(
    docs: DataFrame,
    log_ratios: DataFrame,
    n_buckets: int = DSIR_DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    features: DataFrame | None = None,
) -> DataFrame:
    """(id_col, n_feats, logw_micro): log importance weight per doc.

    Buckets a document carries that the fit never saw contribute the
    OOV λ = ln((0+1)/(T+B)) − ln((0+1)/(R+B)) = ln((R+B)/(T+B)) —
    recovered from the fit table itself (Σ target_c = T and Σ raw_c =
    R exactly, since every training gram lands in some observed
    bucket) and folded in via left join + coalesce rather than
    materializing absent buckets. ``log_ratios`` is bucket-count-sized:
    broadcast join, then one map-side-combined doc agg. Feature-less
    docs get logw 0. ``features``: precomputed
    ``hashed_ngram_features`` output for ``docs`` (same ``n_buckets``)
    — pass the persisted frame shared with ``dsir_fit`` to avoid
    re-featurizing the corpus.
    """
    import math

    tot_row = log_ratios.agg(
        F.coalesce(F.sum("target_c"), F.lit(0)).alias("t"),
        F.coalesce(F.sum("raw_c"), F.lit(0)).alias("r"),
    ).collect()[0]
    oov_lambda = math.log(
        (int(tot_row["r"]) + n_buckets) / (int(tot_row["t"]) + n_buckets)
    )
    feats = (
        features
        if features is not None
        else hashed_ngram_features(docs, n_buckets, text_col, id_col)
    )
    lam = F.broadcast(log_ratios.select("bucket", "log_ratio"))
    agg = (
        feats.join(lam, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(
                F.col("c") * F.coalesce("log_ratio", F.lit(float(oov_lambda)))
            ).alias("logw"),
        )
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce(F.round(F.col("logw") * 1e6), F.lit(0))
            .cast("long")
            .alias("logw_micro"),
        )
    )


def dsir_resample(
    docs: DataFrame,
    log_ratios: DataFrame,
    n: int,
    seed: int = 42,
    n_buckets: int = DSIR_DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel top-``n`` sample without replacement, deterministically.

    key = logw + g_doc, g_doc = −ln(−ln u), u = (md5_52(seed, doc_id)
    + 0.5) / 2^52 ∈ (0, 1). Equivalent in distribution to weighted
    sampling without replacement by w (Gumbel top-k), but a pure
    function of (seed, doc_id) so runs and engines agree bit-for-bit.
    Returns (id_col, logw_micro, key_micro) ordered by key desc.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = dsir_log_weights(docs, log_ratios, n_buckets, text_col, id_col)
    h52 = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col))), 1, 13),
        16,
        10,
    ).cast("long")
    u = (h52 + F.lit(0.5)) / F.lit(float(1 << 52))
    gumbel = -F.log(-F.log(u))
    return (
        w.withColumn(
            "key_micro",
            F.round((F.col("logw_micro") / 1e6 + gumbel) * 1e6).cast("long"),
        )
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(n)
        .select(id_col, "logw_micro", "key_micro")
    )
