"""BPE tokenizer training and encoding over the corpus — the
training-data-pipeline step that turns raw transcripts into a subword
vocabulary (Sennrich et al. 2016; the GPT-2/HuggingFace trainer shape).

The reference engine tokenizes with a fixed alnum splitter (its
Tokenizer normalizes and splits; SURVEY §2 P1) and has no trainable
tokenizer; a 100-TB LLM-data pipeline must LEARN its subword merges
from the corpus. BPE training is famously a two-phase computation and
we keep the phases honest:

  1. **Distributed phase — word counts.** One tokenize scan + one
     map-side-combined groupBy over the full corpus. At 100 TB this is
     the only corpus-sized work, and it is exactly the A1-A5 shape the
     index build already runs — when an index exists, its terms table
     (term, cf) IS the word-count table and training reuses it for
     free (`learn_bpe(index.terms.select(term, cf))`).

  2. **Driver phase — the merge loop.** Greedy argmax over pair counts
     is inherently sequential (merge i changes the counts merge i+1
     sees); every production trainer (HuggingFace tokenizers, GPT-2's
     original) runs it single-node over the word-count dict, which is
     vocabulary-sized, not corpus-sized. ``max_words`` caps the
     driver-resident set (top by count, ties by word asc) with the cap
     recorded in the result, so the 100-TB contract is explicit:
     driver memory is O(vocab), never O(corpus).

Determinism contract (mirrored bit-for-bit by the DuckDB gate twin,
which unrolls the loop as chained CTEs): symbols start as the word's
characters plus a terminal '</w>'; each step picks the pair with the
highest weighted count, ties broken by the ascending 'lhs|rhs' string;
application merges occurrences greedily left-to-right ('x x x' with
merge (x,x) → 'xx x').

Encoding (``bpe_encode``) applies a FROZEN merge list (config, not
data — retraining is a separate pipeline run) to documents: merges
broadcast to every task, Arrow-batched pandas UDF, zero shuffles —
embarrassingly parallel at any scale.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.tokenize import tokens_col

END = "</w>"


def bpe_word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): corpus word frequencies under the engine tokenizer —
    the distributed phase (one scan, one map-side-combined shuffle)."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _merge_seq(syms: list[str], lhs: str, rhs: str) -> list[str]:
    """Greedy left-to-right merge of (lhs, rhs) occurrences."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe_merges_py(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str]]:
    """The driver merge loop — pure function of the word-count table.
    Returns [(rank, lhs, rhs)]; stops early when no pair remains."""
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [END], int(c)) for w, c in word_counts
    ]
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for syms, c in seqs:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]}|{kv[0][1]}"))
        (lhs, rhs), _ = best
        merges.append((rank, lhs, rhs))
        seqs = [(_merge_seq(s, lhs, rhs), c) for s, c in seqs]
    return merges


def learn_bpe(
    word_counts: DataFrame, n_merges: int, max_words: int = 1_000_000
) -> DataFrame:
    """(rank, lhs, rhs): learned merge table. ``word_counts`` is any
    (word, cnt) frame — bpe_word_counts output or the index's terms
    table renamed. The driver set is capped at ``max_words`` (top by
    cnt desc, word asc) so collect() is bounded regardless of corpus.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    spark = word_counts.sparkSession
    rows = (
        word_counts.orderBy(F.desc("cnt"), F.asc("word"))
        .limit(int(max_words))
        .collect()
    )
    merges = learn_bpe_merges_py([(r["word"], r["cnt"]) for r in rows], n_merges)
    return spark.createDataFrame(merges, "rank int, lhs string, rhs string")


def encode_word_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply frozen merges in rank order to one word."""
    syms = list(word) + [END]
    for lhs, rhs in merges:
        if len(syms) == 1:
            break
        syms = _merge_seq(syms, lhs, rhs)
    return syms


def bpe_encode(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """input columns + (units: array<string>, n_units): the document's
    subword stream under the frozen merge list. Merges ride the UDF
    closure (broadcast with the task binary — config-sized); per-batch
    memoization makes cost O(distinct words), Zipf's gift."""
    frozen = [(str(l), str(r)) for l, r in merges]

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        from ..functions.tokenize import tokenize_texts

        cache: dict[str, list[str]] = {}

        def enc_tokens(toks):
            out: list[str] = []
            for t in toks:
                if t not in cache:
                    cache[t] = encode_word_py(t, frozen)
                out.extend(cache[t])
            return out

        return tokenize_texts(texts).map(enc_tokens)

    return df.withColumn("units", _enc(F.col(text_col))).withColumn(
        "n_units", F.size("units")
    )


def bpe_fertility_report(
    df: DataFrame,
    merges: list[tuple[str, str]],
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer-quality report under a frozen merge list —
    the standard BPE evaluation pair:

    - fertility  = subword units per word (lower = the vocabulary fits
      the group better; the metric multilingual-tokenizer papers report
      per language),
    - chars/unit = token-stream chars per subword unit (higher = more
      compression).

    Returns (group_col, n_docs, total_words, total_units,
    total_token_chars, fertility_micro, chars_per_unit_micro).
    Char counts are over the TOKEN stream (Σ len(token)), not raw text
    — whitespace/punct don't reach the tokenizer, and both engines see
    identical integers. One Arrow-batched encode pass (word-memoized)
    + one map-side-combined group agg; ratios divide exact integer
    sums, so micro values hash identically across engines."""
    enc = bpe_encode(df, merges, text_col=text_col)
    toks = tokens_col(F.col(text_col))
    g = enc.select(
        F.col(group_col),
        F.col("n_units"),
        F.size(toks).alias("n_words"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        ).alias("n_token_chars"),
    )
    agg = g.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_units").cast("long").alias("total_units"),
        F.sum("n_token_chars").cast("long").alias("total_token_chars"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "total_words",
        "total_units",
        "total_token_chars",
        F.when(F.col("total_words") > 0,
               F.round(F.col("total_units") / F.col("total_words") * 1e6))
        .otherwise(F.lit(0)).cast("long").alias("fertility_micro"),
        F.when(F.col("total_units") > 0,
               F.round(F.col("total_token_chars") / F.col("total_units") * 1e6))
        .otherwise(F.lit(0)).cast("long").alias("chars_per_unit_micro"),
    )
