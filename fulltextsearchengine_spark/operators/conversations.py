"""Conversation-level training-example assembly over transcripts.

An LLM fine-tuning pipeline doesn't train on isolated turns — each
training example is (context = the preceding turns, target = this
turn's text). These operators turn the engine's transcript table
(conv_id, turn_idx, role, text, ...) into that shape:

- ``conv_context_windows`` — every turn gains a ``context`` column:
  the previous ``n_context`` turns rendered ``role: text`` and joined
  with a separator (empty string for conversation openers).
- ``sft_examples`` — the training view: target-role turns only (default
  ``assistant``) with non-empty context, as (conv_id, turn_idx,
  context, target).

Scale shape: one shuffle partitioned by conv_id, then a bounded-frame
window (ROWS BETWEEN n PRECEDING AND 1 PRECEDING) — per-partition
state is O(n_context), not O(conversation). Conversations are small
and numerous, so the conv_id hash partitioning is skew-free; at 100 TB
this is embarrassingly parallel after the single exchange. The
reference engine has no conversation-assembly surface; this extends
the training-data-pipeline scope over the same transcript input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conv_context_windows(
    transcripts: DataFrame, n_context: int = 4, sep: str = "\n"
) -> DataFrame:
    """(+) ``context``: the previous ``n_context`` turns of the same
    conversation, each rendered ``role: text``, oldest first, joined by
    ``sep``. Conversation openers get ''."""
    if n_context < 1:
        raise ValueError(f"n_context must be >= 1, got {n_context}")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-n_context, -1)
    )
    line = F.concat_ws(": ", F.col("role"), F.coalesce(F.col("text"), F.lit("")))
    return (
        transcripts.withColumn("_line", line)
        .withColumn("context", F.array_join(F.collect_list("_line").over(w), sep))
        .drop("_line")
    )


def sft_examples(
    transcripts: DataFrame,
    n_context: int = 4,
    target_role: str = "assistant",
    sep: str = "\n",
) -> DataFrame:
    """(conv_id, turn_idx, context, target): one supervised example per
    ``target_role`` turn that has at least one preceding turn. The
    context is what the model would see; the target is what it should
    emit."""
    return (
        conv_context_windows(transcripts, n_context=n_context, sep=sep)
        .where((F.col("role") == target_role) & (F.col("context") != ""))
        .select(
            "conv_id",
            "turn_idx",
            "context",
            F.coalesce(F.col("text"), F.lit("")).alias("target"),
        )
    )
