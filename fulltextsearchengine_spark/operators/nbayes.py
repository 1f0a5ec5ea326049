"""Multinomial Naive Bayes text classifier — the trainable
quality/domain filter of large-scale data pipelines (the role fastText
supervised plays in CCNet, and the LR-over-hashed-features classifier
in GPT-3's WebText filtering), built count-first so training is pure
distributed aggregation.

Why NB and not SGD here: at 100 TB the training set for a corpus
filter is itself huge, and multinomial NB's sufficient statistics are
exactly two map-side-combined ``groupBy`` counts ((label, term) and
(label)) — one pass, no iterations, no learning rate, bit-for-bit
deterministic. Accuracy on the bag-of-words filtering tasks these
pipelines use it for is within noise of linear SGD models (McCallum &
Nigam 1998), and every downstream number is exactly reproducible by
the DuckDB oracle.

Model (add-one / Laplace smoothing over the training vocabulary V):
  log P(t | y) = ln((c_ty + 1) / (N_y + V))
  log P(y)     = ln(n_y / n_docs)
Unseen-at-train terms contribute the per-class floor ln(1/(N_y + V))
per occurrence (the c_ty = 0 cell of the same smoothing).

Scale shape: the likelihood table is |V|·|L| rows (vocab-sized —
broadcast); scoring pre-aggregates the corpus to (doc, term, tf)
postings shape (one map-side-combined shuffle), joins the broadcast
likelihoods, and finishes with one (doc, label) agg. Argmax prediction
is computed over the MICRO-ROUNDED scores so prediction is stable
across engines (float-sum-order noise absorbed at the rounding, ties
broken label-asc).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col


class NaiveBayesModel(NamedTuple):
    """priors: (label, n_docs, n_tokens, log_prior, oov_logp);
    likelihoods: (label, term, c, logp) — dense over vocab × labels."""

    priors: DataFrame
    likelihoods: DataFrame
    vocab_size: int


def train_nb(
    docs: DataFrame, label_col: str, text_col: str = "text"
) -> NaiveBayesModel:
    """Fit multinomial NB on ``docs[label_col]``. Rows with a NULL
    label are rejected (filter upstream — silently dropping them would
    skew the priors)."""
    if docs.filter(F.col(label_col).isNull()).limit(1).count() > 0:
        raise ValueError(f"NULL {label_col} in training data; filter first")
    toks = tokens_col(F.col(text_col))
    t = docs.select(F.col(label_col).alias("label"), toks.alias("toks"))
    term_c = (
        t.select("label", F.explode("toks").alias("term"))
        .groupBy("label", "term")
        .agg(F.count("*").alias("c"))
    )
    vocab = term_c.select("term").distinct()
    v = vocab.count()
    n_total = t.count()
    class_c = t.groupBy("label").agg(
        F.count("*").alias("n_docs"), F.sum(F.size("toks")).alias("n_tokens")
    )
    priors = class_c.select(
        "label",
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.log(F.col("n_docs") / F.lit(float(n_total))).alias("log_prior"),
        F.log(F.lit(1.0) / (F.col("n_tokens") + F.lit(v))).alias("oov_logp"),
    )
    # dense vocab × labels grid so every in-vocab term has a smoothed
    # cell for every class (the c=0 cells ARE the model, not absences)
    dense = (
        vocab.crossJoin(F.broadcast(class_c.select("label", "n_tokens")))
        .join(term_c, ["label", "term"], "left")
        .select(
            "label",
            "term",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
            F.log(
                (F.coalesce("c", F.lit(0)) + 1) / (F.col("n_tokens") + F.lit(v))
            ).alias("logp"),
        )
    )
    return NaiveBayesModel(priors, dense, v)


def nb_scores(
    docs: DataFrame,
    model: NaiveBayesModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, label, score_micro): per-class log-joint
    ln P(y) + Σ_t tf·ln P(t|y) for every document × class."""
    toks = tokens_col(F.col(text_col))
    t = docs.select(F.col(id_col), toks.alias("toks"))
    tf = (
        t.select(id_col, F.explode("toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    lk = F.broadcast(model.likelihoods.select("term", "label", "logp"))
    main = (
        tf.join(lk, "term")
        .groupBy(id_col, "label")
        .agg(
            F.sum(F.col("tf") * F.col("logp")).alias("main"),
            F.sum("tf").alias("matched_tf"),
        )
    )
    n_tok = t.select(id_col, F.size("toks").alias("n_tokens"))
    pri = F.broadcast(model.priors.select("label", "log_prior", "oov_logp"))
    # every doc × every label (docs with zero in-vocab terms still get
    # prior + all-OOV mass)
    grid = n_tok.crossJoin(pri)
    scored = grid.join(main, [id_col, "label"], "left").select(
        id_col,
        "label",
        (
            F.col("log_prior")
            + F.coalesce("main", F.lit(0.0))
            + (F.col("n_tokens") - F.coalesce("matched_tf", F.lit(0)))
            * F.col("oov_logp")
        ).alias("score"),
    )
    return scored.select(
        id_col,
        "label",
        F.round(F.col("score") * 1e6).cast("long").alias("score_micro"),
    )


def nb_predict(
    docs: DataFrame,
    model: NaiveBayesModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, pred_label, margin_micro): argmax class per doc over
    the micro-rounded scores (cross-engine-stable; ties label-asc);
    margin = best − runner-up (0 when there is a single class)."""
    s = nb_scores(docs, model, text_col=text_col, id_col=id_col)
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_micro"), F.asc("label")
    )
    ranked = s.withColumn("rn", F.row_number().over(w)).withColumn(
        "runner_up", F.lead("score_micro", 1).over(w)
    )
    return ranked.filter(F.col("rn") == 1).select(
        id_col,
        F.col("label").alias("pred_label"),
        (
            F.col("score_micro") - F.coalesce("runner_up", F.col("score_micro"))
        ).alias("margin_micro"),
    )
