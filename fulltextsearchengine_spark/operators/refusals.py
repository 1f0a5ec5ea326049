"""Refusal + boilerplate detection over agent transcripts — the
transcript-specific quality filters an LLM-training pipeline runs
before using conversations as SFT data.

Two public-practice signals (e.g. the distillation-hygiene filters
described around ShareGPT/Alpaca-style corpora):

- **refusal turns**: assistant turns containing a canned-refusal
  phrase ("i cannot", "as an ai", …). Matching is on the CANONICAL
  token stream (engine tokenizer, space-joined) so punctuation and
  case variants collapse — "I'm sorry," and "i m sorry" match the
  same pattern. Phrases are matched as whole-token subsequences
  (space-padded containment), never substrings, so "as an ai" does
  not fire inside "as an airline".

- **boilerplate turns**: assistant turns whose exact canonical text
  (dup_count) or whose first-``opener_tokens``-token opener
  (opener_count) repeats across the corpus ≥ threshold times — the
  template/greeting detector ("Sure! Here's…" × 40k).

Scale shape: one tokenize scan; two fingerprint-keyed aggregations
(md5 of canon / of opener — map-side combined, so hot template keys
pre-collapse per partition) joined back on their fingerprints. No
windows over hot keys, no Python, no corpus-sized collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import fold_query_text, tokens_col

# Default refusal markers, already in canonical token-stream form
# (what the tokenizer makes of "I can't…", "I'm sorry, but…", …).
REFUSAL_PHRASES: list[str] = [
    "i cannot",
    "i can t",
    "i am unable to",
    "i m unable to",
    "as an ai",
    "i m sorry but",
    "i apologize but",
    "i will not",
]

OPENER_TOKENS = 8
BOILERPLATE_MIN_COUNT = 3


def refusal_report(
    transcripts: DataFrame,
    phrases: list[str] | None = None,
    role: str = "assistant",
    opener_tokens: int = OPENER_TOKENS,
    opener_min_count: int = BOILERPLATE_MIN_COUNT,
    dup_min_count: int = BOILERPLATE_MIN_COUNT,
) -> DataFrame:
    """Per ``role`` turn: (conv_id, turn_idx, is_refusal, opener_count,
    dup_count, is_boilerplate).

    ``phrases`` are re-folded through the engine tokenizer, so callers
    may pass natural text ("I can't help with that") and get canonical
    matching for free. Empty turns are never refusals and are exempt
    from boilerplate counting (an empty opener is not a template).
    """
    if opener_tokens < 1:
        raise ValueError(f"opener_tokens must be >= 1, got {opener_tokens}")
    if opener_min_count < 2 or dup_min_count < 2:
        raise ValueError("boilerplate thresholds must be >= 2 (1 matches everything)")
    folded = sorted(
        {" ".join(fold_query_text(p)) for p in (phrases or REFUSAL_PHRASES)}
    )
    folded = [p for p in folded if p]
    if not folded:
        raise ValueError("no non-empty refusal phrases after tokenization")

    toks = tokens_col(F.col("text"))
    turns = transcripts.filter(F.col("role") == role).select(
        "conv_id",
        "turn_idx",
        F.array_join(toks, " ").alias("_canon"),
        F.array_join(F.slice(toks, 1, opener_tokens), " ").alias("_opener"),
    )
    padded = F.concat(F.lit(" "), F.col("_canon"), F.lit(" "))
    is_refusal = F.lit(False)
    for p in folded:
        is_refusal = is_refusal | padded.contains(f" {p} ")
    turns = turns.withColumn(
        "is_refusal", (F.length("_canon") > 0) & is_refusal
    ).withColumn("_canon_fp", F.md5("_canon")).withColumn(
        "_opener_fp", F.md5("_opener")
    )

    nonempty = turns.filter(F.length("_canon") > 0)
    dup_counts = nonempty.groupBy("_canon_fp").agg(
        F.count(F.lit(1)).cast("long").alias("dup_count")
    )
    opener_counts = nonempty.groupBy("_opener_fp").agg(
        F.count(F.lit(1)).cast("long").alias("opener_count")
    )
    out = (
        turns.join(dup_counts, "_canon_fp", "left")
        .join(opener_counts, "_opener_fp", "left")
        .select(
            "conv_id",
            "turn_idx",
            "is_refusal",
            F.coalesce(F.col("opener_count"), F.lit(0)).cast("long").alias("opener_count"),
            F.coalesce(F.col("dup_count"), F.lit(0)).cast("long").alias("dup_count"),
            (
                (F.coalesce(F.col("opener_count"), F.lit(0)) >= opener_min_count)
                | (F.coalesce(F.col("dup_count"), F.lit(0)) >= dup_min_count)
            ).alias("is_boilerplate"),
        )
    )
    return out


def conv_refusal_report(
    transcripts: DataFrame,
    phrases: list[str] | None = None,
    role: str = "assistant",
    opener_tokens: int = OPENER_TOKENS,
    opener_min_count: int = BOILERPLATE_MIN_COUNT,
    dup_min_count: int = BOILERPLATE_MIN_COUNT,
) -> DataFrame:
    """Conversation rollup: (conv_id, n_role_turns, n_refusals,
    n_boilerplate, refusal_ratio_micro) — the keep/drop signal at SFT
    granularity (one conv_id-keyed agg over the turn report)."""
    rep = refusal_report(
        transcripts,
        phrases=phrases,
        role=role,
        opener_tokens=opener_tokens,
        opener_min_count=opener_min_count,
        dup_min_count=dup_min_count,
    )
    return rep.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_role_turns"),
        F.sum(F.col("is_refusal").cast("long")).cast("long").alias("n_refusals"),
        F.sum(F.col("is_boilerplate").cast("long")).cast("long").alias("n_boilerplate"),
        F.round(
            F.sum(F.col("is_refusal").cast("long")) / F.count(F.lit(1)) * 1e6
        )
        .cast("long")
        .alias("refusal_ratio_micro"),
    )
