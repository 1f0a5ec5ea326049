"""Ordered funnel analysis over the events stream — "of the users who
viewed, how many then clicked, then purchased, in that order?" — the
product-analytics operator every activity warehouse ships next to
sessionization.

Semantics: greedy-earliest cascade. Per user, step 1's timestamp is the
earliest event of the first type; step i's timestamp is the earliest
event of type i at-or-after step i-1's timestamp (``>=`` — equal
timestamps count, whatever the event ids). ``steps_completed`` is the
length of the longest prefix with a timestamp. Greedy-earliest is the
standard warehouse formulation (it answers "CAN the user have done the
steps in order", and each t_i is the earliest proof), and it is the one
that nests: the step-i set is computed only from the step-(i-1) result.

Plan shape at 100 TB: ONE shuffle on user_id, then k cascaded running
``min`` windows over the SAME (partition, ordering) — Spark plans them
as consecutive Window operators over one sort, no extra exchange — and
one partial-aggregating groupBy. The running-min frame is RANGE-based
on the epoch (not ROWS) so same-timestamp events are all in frame,
matching the ``>=`` semantics exactly however ties are ordered.

Skew: one hyperactive user = one task's rows (same note as
``sessions.sessionize``); k is the funnel length, a small constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessions import _epoch_s


def funnel_report(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per user seen in ``events``: (user_id, steps_completed,
    step timestamps as epoch-micros ``t1_micro..tk_micro``, null from
    the first missed step on). Users with zero step-1 events still
    appear with steps_completed = 0."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")

    eps = _epoch_s(F.col(ts_col))
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col("_eps"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events.select(F.col(user_col), F.col(type_col).alias("_ty"), eps.alias("_eps"))
    prev = None
    scols = []
    for i, step in enumerate(steps):
        cond = F.col("_ty") == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(prev) <= F.col("_eps"))
        name = f"_s{i}"
        df = df.withColumn(name, F.min(F.when(cond, F.col("_eps"))).over(w))
        scols.append(name)
        prev = name
    agg = df.groupBy(user_col).agg(
        *[F.min(c).alias(c) for c in scols]
    )
    completed = sum(
        F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in scols
    )
    return agg.select(
        F.col(user_col),
        completed.cast("long").alias("steps_completed"),
        *[
            F.round(F.col(c) * 1e6).cast("long").alias(f"t{i + 1}_micro")
            for i, c in enumerate(scols)
        ],
    )
