"""Bigram language model with stupid backoff + per-document
perplexity — the CCNet-style LM quality filter for training-data
pipelines.

The reference engine has no language model (its scorers are the three
rankers, webdata/search/ReviewSearch.java); this is part of the
beyond-reference training-data surface (SURVEY §2 addendum). The
published design points it follows:

- Brants et al., "Large Language Models in Machine Translation"
  (EMNLP 2007): *stupid backoff* — S(w2|w1) = c(w1 w2)/c(w1) when the
  bigram was seen, else alpha * S(w2), alpha = 0.4. No discounting, no
  normalization; chosen there precisely because it trains as pure
  distributed counting at web scale, which is the same reason it fits
  Spark: training is two map-side-combined ``groupBy`` counts and
  nothing else.
- Wenzek et al., "CCNet" (2019): train the LM on a trusted target
  corpus, score the raw corpus, keep the low-perplexity tail. The
  train/score split here is the same: ``train_bigram_lm`` on any slice,
  ``bigram_xent`` on any other corpus.

Unigram base distribution uses add-one smoothing with a single shared
UNK bucket: S(w) = (c(w) + 1) / (N + V + 1), so out-of-vocabulary
tokens at score time get a finite, strictly-smallest probability
instead of -inf (the raw c(w)/N of the paper assumes scoring the
training corpus).

Scale shape (the 100-TB contract):
- train: tokens explode once; bigrams come from ``arrays_zip`` of two
  array slices (pure codegen, zero extra shuffle before the agg); each
  count is ONE map-side-combined shuffle keyed by the n-gram. Optional
  ``min_count`` prunes the bigram table (Brants' count cutoff) —
  pruning only increases backoff, denominators stay unpruned.
- score: per-doc (prev, cur) pairs are pre-aggregated to
  (doc_id, prev, cur, pair_tf) — the exact postings-table shape, so the
  joins against the vocab-sized unigram table (AQE-broadcastable) and
  the bigram table (shuffle on (w1, w2)) touch distinct-per-doc rows,
  not raw token positions; one final map-side-combined agg by doc_id.
  No Python anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col

STUPID_BACKOFF_ALPHA = 0.4


class BigramLM(NamedTuple):
    """A trained LM: two count tables + the two scalars every score
    needs. ``unigrams``/``bigrams`` are plain DataFrames — persist them
    with ``.write.parquet`` like any other index sidecar."""

    unigrams: DataFrame  # (term, c)
    bigrams: DataFrame  # (w1, w2, c)
    total_tokens: int  # N = sum of unigram counts
    vocab_size: int  # V = distinct terms in training


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> BigramLM:
    """Count unigrams and within-document bigrams over ``docs``.

    ``min_count`` drops bigrams with c < min_count (count cutoff;
    standard at web scale — Brants et al. §4.2). Unigram counts and N
    are never pruned, so pruning only widens the backoff path.
    """
    toks = tokens_col(F.col(text_col))
    t = docs.select(toks.alias("toks"))
    uni = (
        t.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    m = F.greatest(F.size(F.col("toks")) - 1, F.lit(0))  # slice len ≥ 0
    pairs = t.select(
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, m).alias("w1"),
                F.slice("toks", 2, m).alias("w2"),
            )
        ).alias("p")
    )
    big = (
        pairs.select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    if min_count > 1:
        big = big.filter(F.col("c") >= min_count)
    row = uni.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n"), F.count("*").alias("v")
    ).collect()[0]
    return BigramLM(uni, big, int(row["n"]), int(row["v"]))


def bigram_xent(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> DataFrame:
    """Per-document cross-entropy / perplexity under ``lm``.

    Returns (id_col, n_tokens, xent_micro, ppl_micro): xent = mean
    -ln S over the doc's tokens (first token scored by the smoothed
    unigram, the rest by stupid backoff), ppl = e^xent. Empty docs
    score 0. Micro-scaled ints for cross-engine hash stability.
    """
    toks = tokens_col(F.col(text_col))
    t = docs.select(F.col(id_col), toks.alias("toks"))
    m = F.greatest(F.size(F.col("toks")) - 1, F.lit(0))  # slice len ≥ 0
    # (prev, cur) with prev = NULL at position 1; pre-aggregate to the
    # postings shape (doc, prev, cur, pair_tf) before any join.
    pairs = t.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.concat(
                    F.array(F.lit(None).cast("string")), F.slice("toks", 1, m)
                ).alias("prev"),
                F.col("toks").alias("cur"),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    # arrays_zip pads the shorter side with null: an empty-token doc zips
    # its [null] prev seed against [] and yields one (null, null) row —
    # real tokens are never null, so dropping null cur removes exactly it.
    pairs = pairs.filter(F.col("cur").isNotNull())
    pair_tf = pairs.groupBy(id_col, "prev", "cur").agg(
        F.count("*").alias("pair_tf")
    )
    uni_cur = lm.unigrams.select(
        F.col("term").alias("cur"), F.col("c").alias("c_cur")
    )
    uni_prev = lm.unigrams.select(
        F.col("term").alias("prev"), F.col("c").alias("c_prev")
    )
    big = lm.bigrams.select(
        F.col("w1").alias("prev"), F.col("w2").alias("cur"), F.col("c").alias("c_big")
    )
    joined = (
        pair_tf.join(uni_cur, "cur", "left")
        .join(uni_prev, "prev", "left")
        .join(big, ["prev", "cur"], "left")
    )
    s_uni = (F.coalesce(F.col("c_cur"), F.lit(0)) + F.lit(1)) / F.lit(
        float(lm.total_tokens + lm.vocab_size + 1)
    )
    s = (
        F.when(F.col("prev").isNull(), s_uni)
        .when(
            F.col("c_big").isNotNull(), F.col("c_big") / F.col("c_prev")
        )
        .otherwise(F.lit(float(alpha)) * s_uni)
    )
    scored = joined.select(
        id_col, F.col("pair_tf"), (-F.log(s) * F.col("pair_tf")).alias("nll")
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("pair_tf").cast("long").alias("n_tokens"),
        F.sum("nll").alias("nll"),
    )
    # left join back so token-less docs appear with 0 (same contract as
    # text_unigram_xent).
    out = (
        t.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(
                F.round(F.col("nll") / F.col("n_tokens") * 1e6), F.lit(0)
            )
            .cast("long")
            .alias("xent_micro"),
        )
    )
    # ppl derives from the ALREADY-ROUNDED xent so both engines
    # exponentiate the identical double (float-sum order noise is
    # absorbed once, at the xent rounding).
    return out.withColumn(
        "ppl_micro",
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(F.round(F.exp(F.col("xent_micro") / 1e6) * 1e6))
        .cast("long"),
    )


def perplexity_filter(
    docs: DataFrame,
    lm: BigramLM,
    max_xent_micro: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> DataFrame:
    """Keep documents whose LM cross-entropy is ≤ ``max_xent_micro``
    (CCNet's head/middle split). Token-less docs score 0 and pass —
    compose with the length rules in ``operators.pipeline`` to drop
    them."""
    x = bigram_xent(docs, lm, text_col=text_col, id_col=id_col, alpha=alpha)
    keep = x.filter(F.col("xent_micro") <= max_xent_micro).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def perplexity_buckets(
    docs: DataFrame,
    lm: BigramLM,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> DataFrame:
    """(id_col, xent_micro, bucket): CCNet's head/middle/tail split —
    bucket 1 = lowest cross-entropy (head, most target-like), bucket
    ``n_buckets`` = tail. Buckets are VALUE-threshold based: boundary_k
    = smallest xent_micro whose cumulative count reaches ⌈k·n/m⌉, and
    bucket(x) = 1 + #{k : x > boundary_k}; ties share a bucket, so the
    split is a pure function of the value — deterministic across
    engines and stable under repartitioning.

    Scale shape: no global sort/window. xent_micro is integer-valued,
    so the distribution reduces to a value histogram (one map-side
    combined agg, at most |distinct xent| rows — bounded and tiny),
    the boundaries fold on the driver, and bucketing is a map. At
    100 TB this is two jobs over the scored frame; persist
    ``bigram_xent`` output if also consumed elsewhere."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be ≥ 2, got {n_buckets}")
    x = bigram_xent(docs, lm, text_col=text_col, id_col=id_col, alpha=alpha)
    hist = sorted(
        (int(r["xent_micro"]), int(r["c"]))
        for r in x.groupBy("xent_micro").agg(F.count("*").alias("c")).collect()
    )
    n = sum(c for _, c in hist)
    boundaries = []
    cum, k = 0, 1
    for v, c in hist:
        cum += c
        while k < n_buckets and cum >= -(-k * n // n_buckets):  # ceil
            boundaries.append(v)
            k += 1
    bucket = F.lit(1)
    for b in boundaries:
        bucket = bucket + (F.col("xent_micro") > F.lit(b)).cast("int")
    return x.select(id_col, "xent_micro", bucket.cast("long").alias("bucket"))
