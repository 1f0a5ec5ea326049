"""Text-analysis functions for large-scale training-data pipelines:
language-ID (stopword-vote heuristic), quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions (JVM-side,
whole-stage codegen) over a (doc_id, text) corpus — no Python in the
hot path. Each has an exact ANSI-SQL twin in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tokenize import tokens_col

# Tiny per-language stopword lists for the n-gram-free language-ID vote.
# Deliberately small + fixed so the SQL oracle can inline them.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "des"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "du", "une", "que"],
}


def _count_in(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(+) n_ws_tokens (whitespace split), n_alnum_tokens (engine
    tokenizer), n_chars."""
    ws = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    toks = tokens_col(F.col(text_col))
    return (
        df.withColumn(
            "n_ws_tokens",
            F.when(F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "", F.lit(0))
            .otherwise(F.size(ws))
            .cast("long"),
        )
        .withColumn("n_alnum_tokens", F.size(toks).cast("long"))
        .withColumn("n_chars", F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long"))
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality signals (micro-scaled ints so results hash stably across
    engines): mean token length, unique-token ratio, non-alnum char
    ratio, stopword(en) ratio."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    text = F.coalesce(F.col(text_col), F.lit(""))
    alnum_chars = F.length(F.regexp_replace(text, "[^A-Za-z0-9]", ""))
    out = (
        df.withColumn("_toks", toks)
        .withColumn("n_tokens", n.cast("long"))
        .withColumn(
            "mean_token_len_micro",
            F.when(n > 0, F.round(alnum_chars / n * 1e6)).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn(
            "uniq_ratio_micro",
            F.when(n > 0, F.round(F.size(F.array_distinct(F.col("_toks"))) / n * 1e6))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "punct_ratio_micro",
            F.when(
                F.length(text) > 0,
                F.round((F.length(text) - alnum_chars) / F.length(text) * 1e6),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "stopword_ratio_micro",
            F.when(n > 0, F.round(_count_in(F.col("_toks"), LANG_STOPWORDS["en"]) / n * 1e6))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .drop("_toks")
    )
    return out


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: per-language stopword hit counts; argmax
    wins, ties (incl. all-zero) → 'und'. Deterministic argmax order:
    languages compared in sorted code order."""
    toks = tokens_col(F.col(text_col))
    d = df.withColumn("_toks", toks)
    for code, words in LANG_STOPWORDS.items():
        d = d.withColumn(f"_hits_{code}", _count_in(F.col("_toks"), words))
    codes = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"_hits_{c}") for c in codes])
    pred = F.lit("und")
    # first (sorted) language achieving the max, if max > 0
    expr = None
    for c in codes:
        cond = F.col(f"_hits_{c}") == best
        expr = F.when(cond, F.lit(c)) if expr is None else expr.when(cond, F.lit(c))
    pred = F.when(best > 0, expr).otherwise(F.lit("und"))
    return d.withColumn("lang_pred", pred).drop("_toks", *[f"_hits_{c}" for c in codes])


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 over the canonical token stream
    (tokenize → join with single spaces). Robust to case/punctuation/
    whitespace variance — the exact-dedup key."""
    toks = tokens_col(F.col(text_col))
    return df.withColumn("fingerprint", F.md5(F.array_join(toks, " ")))


def unigram_xent(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, xent_micro): per-document cross-entropy (nats,
    ×1e6) under the corpus's own unigram MLE — mean over the doc's token
    stream of −ln(cf_t / total_tokens).

    The standard corpus-LM quality signal (CCNet-style perplexity
    filtering, done with a self-trained unigram model instead of an
    external KenLM): LOW xent = the doc is made of the corpus's most
    common words (boilerplate, listings); HIGH xent = rare-token-dense
    (noise, codes, other-language residue). Filter both tails.

    Scale shape (100 TB): tokenize+explode is embarrassingly parallel;
    cf is one partial-agg groupBy over (term) — vocabulary-sized output,
    typically broadcastable; per-doc tf one partial-agg groupBy over
    (doc_id, term); the tf⋈cf join is vocabulary-keyed (hot terms are
    exactly the high-cf rows, and the cf side is tiny, so broadcast-hash
    — no skewed shuffle). Zero-token docs surface with n_tokens=0,
    xent_micro=0 (a left join from the corpus, not a dropped row)."""
    base = df.select(F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks"))
    tok = base.select("doc_id", F.explode("_toks").alias("term"))
    cf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    total = cf.agg(F.sum("cf").alias("total"))
    dt = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    nll = (
        dt.join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf")
                * -F.log(F.col("cf").cast("double") / F.col("total"))
            ).alias("nll"),
            F.sum("tf").alias("n_tokens"),
        )
    )
    return (
        base.select("doc_id")
        .join(nll, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(
                F.round(F.col("nll") / F.col("n_tokens") * 1e6).cast("long"),
                F.lit(0),
            ).alias("xent_micro"),
        )
    )


# Gopher / MassiveText document-quality rules (Rae et al. 2021, Table
# A1 — public), expressed over the micro-int signal columns so every
# boundary is bit-identical across engines. The word-count band is
# parameterized: the paper's 50..100k is tuned for web pages; transcript
# turns run shorter.
GOPHER_DEFAULTS = dict(
    min_tokens=50,
    max_tokens=100_000,
    min_mean_token_len_micro=3_000_000,
    max_mean_token_len_micro=10_000_000,
    max_punct_ratio_micro=300_000,  # paper: ≤20% symbol-ish mass; punct here
    min_stopword_ratio_micro=20_000,  # ≥2% stopword mass ≈ "has ≥2 stop words"
    min_uniq_ratio_micro=200_000,  # dedup-adjacent degenerate-repeat guard
)


def gopher_rules_report(df: DataFrame, text_col: str = "text", **overrides) -> DataFrame:
    """Per-document Gopher-rule verdicts: one boolean column per rule
    (named ``rule_*``) plus ``gopher_keep`` = AND of all — emitted as a
    REPORT rather than a silent filter so a pipeline can count which
    rule kills what (the per-rule attrition table the paper publishes).
    Thresholds override via kwargs; all comparisons are micro-int.
    Unknown kwarg names raise — a misspelled threshold (``min_token=``)
    silently running at its default is a data-quality bug (ADVICE r3)."""
    unknown = set(overrides) - set(GOPHER_DEFAULTS)
    if unknown:
        raise TypeError(
            f"unknown Gopher threshold(s) {sorted(unknown)}; "
            f"valid: {sorted(GOPHER_DEFAULTS)}"
        )
    p = {**GOPHER_DEFAULTS, **overrides}
    sig = with_quality(df, text_col=text_col)
    rules = {
        "rule_word_count": (F.col("n_tokens") >= p["min_tokens"])
        & (F.col("n_tokens") <= p["max_tokens"]),
        "rule_mean_word_len": (
            F.col("mean_token_len_micro") >= p["min_mean_token_len_micro"]
        )
        & (F.col("mean_token_len_micro") <= p["max_mean_token_len_micro"]),
        "rule_symbol_ratio": F.col("punct_ratio_micro")
        <= p["max_punct_ratio_micro"],
        "rule_stopwords": F.col("stopword_ratio_micro")
        >= p["min_stopword_ratio_micro"],
        "rule_uniq_tokens": F.col("uniq_ratio_micro")
        >= p["min_uniq_ratio_micro"],
    }
    out = sig
    keep = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        keep = keep & cond
    return out.withColumn("gopher_keep", keep)


def gopher_filter(df: DataFrame, text_col: str = "text", **overrides) -> DataFrame:
    """Documents passing every Gopher rule, original columns only."""
    rep = gopher_rules_report(df, text_col=text_col, **overrides)
    return rep.filter(F.col("gopher_keep")).select(*df.columns)
