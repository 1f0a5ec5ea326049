"""C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning…", §2.2) — the canonical web-corpus line/page filter
set, as pure Catalyst expressions over a multi-line (doc_id, text)
corpus.

Rules implemented (paper order):
- line: keep only lines ending in a terminal punctuation mark
  (period, exclamation mark, question mark, or end quotation mark);
- line: keep only lines with ≥ ``min_line_words`` whitespace words
  (paper: 5);
- line: drop any line containing the word "javascript" (tokenizer
  semantics, case-insensitive);
- page: drop pages with fewer than ``min_sentences`` sentences in the
  retained text (paper: 3) — sentences counted as terminal `.!?` marks
  in the kept lines;
- page: drop pages containing the phrase "lorem ipsum"
  (case-insensitive);
- page: drop pages containing a curly brace "{";
- page: drop pages containing a blocklisted word. ``C4_BADWORDS`` is a
  deliberately tiny fixed placeholder (deployments swap in the LDNOOBW
  list) so the ANSI-SQL oracle twin can inline it.

The paper's remaining rule — three-sentence-span dedup across the
corpus — is `operators/dedup.remove_duplicate_spans` (Lee et al.
formulation); compose with it.

Everything is line-HOF + scalar expressions: zero shuffles, zero
Python, whole-stage codegen end to end — a 100 TB corpus pass is one
embarrassingly-parallel scan (same shape as textstats/gopher).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tokenize import tokens_col

C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
# Placeholder blocklist — fixed + tiny so the SQL oracle inlines it.
C4_BADWORDS: list[str] = ["badwordalpha", "badwordbravo", "badwordcharlie"]
_TERMINAL_RE = r'[.!?"]$'


def _kept_lines(text: Column, min_line_words: int) -> Column:
    """array<string> of retained ORIGINAL lines (predicates evaluate on
    the trimmed line; the kept line keeps its original bytes)."""
    lines = F.split(text, "\n")
    def keep(line: Column) -> Column:
        lt = F.trim(line)
        return (
            lt.rlike(_TERMINAL_RE)
            & (F.size(F.split(lt, r"\s+")) >= min_line_words)
            & ~F.array_contains(tokens_col(lt), "javascript")
        )
    return F.filter(lines, keep)


def c4_rules_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_sentences: int = C4_MIN_SENTENCES,
    badwords: list[str] | None = None,
) -> DataFrame:
    """Per-document C4 verdict table (the gopher_rules_report shape —
    a REPORT, so pipelines can publish per-rule attrition):

    (doc_id, n_lines, n_kept_lines, n_sentences, rule_min_sentences,
     rule_no_lorem, rule_no_brace, rule_no_badwords, c4_keep,
     clean_text)

    ``clean_text`` is the retained lines rejoined with newlines — what
    C4 would emit for this page; ``c4_keep`` ANDs the page-level rules
    (line rules edit the text, they don't kill the page).
    """
    if min_line_words < 1:
        raise ValueError(f"min_line_words must be >= 1, got {min_line_words}")
    if min_sentences < 0:
        raise ValueError(f"min_sentences must be >= 0, got {min_sentences}")
    bad = C4_BADWORDS if badwords is None else list(badwords)
    text = F.coalesce(F.col(text_col), F.lit(""))
    d = (
        df.select(F.col(id_col).alias("doc_id"), text.alias("_t"))
        .withColumn("_kept", _kept_lines(F.col("_t"), min_line_words))
        .withColumn("clean_text", F.array_join(F.col("_kept"), "\n"))
    )
    n_sentences = F.length(
        F.regexp_replace(F.col("clean_text"), r"[^.!?]", "")
    ).cast("long")
    rule_sent = n_sentences >= min_sentences
    rule_lorem = ~F.lower(F.col("_t")).contains("lorem ipsum")
    rule_brace = ~F.col("_t").contains("{")
    rule_bad = ~F.arrays_overlap(
        tokens_col(F.col("_t")), F.array(*[F.lit(w) for w in sorted(bad)])
    )
    return d.select(
        "doc_id",
        F.size(F.split(F.col("_t"), "\n")).cast("long").alias("n_lines"),
        F.size("_kept").cast("long").alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        rule_sent.alias("rule_min_sentences"),
        rule_lorem.alias("rule_no_lorem"),
        rule_brace.alias("rule_no_brace"),
        rule_bad.alias("rule_no_badwords"),
        (rule_sent & rule_lorem & rule_brace & rule_bad).alias("c4_keep"),
        "clean_text",
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_sentences: int = C4_MIN_SENTENCES,
    badwords: list[str] | None = None,
) -> DataFrame:
    """The corpus C4 would keep: pages passing every page rule, with
    ``text`` replaced by the line-filtered clean_text. Non-text columns
    pass through via a doc_id join against the input (one keyed join;
    at scale both sides are the same partitioning)."""
    rep = c4_rules_report(
        df,
        text_col=text_col,
        id_col=id_col,
        min_line_words=min_line_words,
        min_sentences=min_sentences,
        badwords=badwords,
    )
    keep = rep.filter(F.col("c4_keep")).select(
        "doc_id", F.col("clean_text").alias(text_col)
    )
    others = [c for c in df.columns if c not in (text_col, id_col)]
    if not others:
        return keep
    side = df.select(F.col(id_col).alias("doc_id"), *others)
    return keep.join(side, "doc_id").select("doc_id", text_col, *others)
