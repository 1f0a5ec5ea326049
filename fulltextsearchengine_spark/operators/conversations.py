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


def conv_health_report(transcripts: DataFrame) -> DataFrame:
    """Per-conversation structural QA — the agent-transcript
    degeneracy signals a training pipeline filters on before any text
    metric (a stuck agent loops the same role/tool for dozens of
    turns; a broken collector drops the system preamble):

    (conv_id, n_turns, n_same_role_repeats, max_same_role_run,
     n_tool_turns, max_tool_run, starts_with_system)

    - n_same_role_repeats: consecutive turn pairs with the same role,
    - max_same_role_run: longest same-role streak (gaps-and-islands
      via a running change-marker sum — no self-join),
    - max_tool_run: longest streak of consecutive turns invoking the
      SAME non-null tool (the tool-loop signal),
    - starts_with_system: turn 0's role is 'system' (1/0).

    One exchange on conv_id serves every window and the final agg
    (same subset-partitioning reuse as sessionize). Turn order is the
    (turn_idx) contract of the input table.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_role = F.lag("role").over(w)
    prev_tool = F.lag("tool").over(w)
    marked = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        (prev_role.isNull() | (F.col("role") != prev_role))
        .cast("int")
        .alias("role_change"),
        (
            F.col("tool").isNotNull()
            & (prev_tool.isNull() | (F.col("tool") != prev_tool))
        )
        .cast("int")
        .alias("tool_start"),
        F.when(
            (F.col("turn_idx") == 0) & (F.col("role") == "system"), 1
        )
        .otherwise(0)
        .alias("sys_start"),
    )
    runs = marked.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "role_change",
        "sys_start",
        F.sum("role_change").over(w).alias("role_run_id"),
        F.sum("tool_start").over(w).alias("tool_run_id"),
    )
    role_runs = (
        runs.groupBy("conv_id", "role_run_id")
        .agg(F.count("*").alias("run_len"))
        .groupBy("conv_id")
        .agg(F.max("run_len").alias("max_same_role_run"))
    )
    tool_runs = (
        runs.filter(F.col("tool").isNotNull())
        .groupBy("conv_id", "tool_run_id")
        .agg(F.count("*").alias("run_len"))
        .groupBy("conv_id")
        .agg(F.max("run_len").alias("max_tool_run"))
    )
    base = runs.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        (F.count("*") - F.sum("role_change")).cast("long").alias("n_same_role_repeats"),
        F.sum(F.col("tool").isNotNull().cast("long")).cast("long").alias("n_tool_turns"),
        F.max("sys_start").cast("long").alias("starts_with_system"),
    )
    return (
        base.join(role_runs, "conv_id")
        .join(tool_runs, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            "n_same_role_repeats",
            F.col("max_same_role_run").cast("long").alias("max_same_role_run"),
            "n_tool_turns",
            F.coalesce("max_tool_run", F.lit(0)).cast("long").alias("max_tool_run"),
            "starts_with_system",
        )
    )
