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
When a single key can exceed task memory, pass ``split_bucket_seconds``:
the cascade runs per (user, coarse time bucket) and buckets are stitched
exactly. The stitch exploits that bucket times are disjoint and
increasing — a step completed in an EARLIER bucket automatically
satisfies the ``>=`` constraint for any event in a later bucket — so
each bucket only needs its k(k+1)/2 "entry level" cascade values
(entering with i steps already done, what do steps i+1..k resolve to
in-bucket?), computed by k cascades over the same (user, bucket) sort.
The per-user fold over that per-bucket state table (one row per
non-empty bucket, k² doubles) runs in ``applyInPandas`` — bounded by
time-range/bucket_width rows per user regardless of event count.
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
    split_bucket_seconds: float | None = None,
) -> DataFrame:
    """One row per user seen in ``events``: (user_id, steps_completed,
    step timestamps as epoch-micros ``t1_micro..tk_micro``, null from
    the first missed step on). Users with zero step-1 events still
    appear with steps_completed = 0.

    ``split_bucket_seconds``: opt-in hot-key pre-split (module
    docstring) — value-identical, bounds task memory by rows-per-bucket.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    if split_bucket_seconds is not None:
        if split_bucket_seconds <= 0:
            raise ValueError("split_bucket_seconds must be > 0")
        return _funnel_split(
            events, steps, user_col, ts_col, type_col,
            float(split_bucket_seconds),
        )

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


def _funnel_split(
    events: DataFrame,
    steps: list[str],
    user_col: str,
    ts_col: str,
    type_col: str,
    bw: float,
) -> DataFrame:
    """(user, time-bucket)-partitioned funnel + exact bucket stitch.

    Bucket b's events all precede bucket b+1's, so entering a bucket
    with i steps complete, the i+1'th step needs no ``>=`` guard against
    the (earlier-bucket) t_i. Per (user, bucket) we therefore run k
    cascades — entry level e ∈ 0..k-1 starts unconstrained at step e —
    and per-bucket-agg their running mins into an entry-level state
    table. The per-user fold over that table (applyInPandas, rows
    bounded by the time range / bucket width) replays buckets in order:
    at entry level c it copies the bucket's level-c cascade prefix.
    """
    import pandas as pd

    from pyspark.sql import types as T

    k = len(steps)
    eps = _epoch_s(F.col(ts_col))
    df = (
        events.select(
            F.col(user_col), F.col(type_col).alias("_ty"), eps.alias("_eps")
        )
        # non-step events can't contribute; dropping them first is what
        # shrinks a hot key before the shuffle
        .filter(F.col("_ty").isin(list(steps)))
        .withColumn("_fbkt", F.floor(F.col("_eps") / F.lit(bw)).cast("long"))
    )
    wb = (
        Window.partitionBy(user_col, "_fbkt")
        .orderBy(F.col("_eps"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    names: list[str] = []
    for e in range(k):
        prev = None
        for j in range(e, k):
            cond = F.col("_ty") == F.lit(steps[j])
            if prev is not None:
                cond = cond & (F.col(prev) <= F.col("_eps"))
            name = f"_e{e}s{j}"
            df = df.withColumn(name, F.min(F.when(cond, F.col("_eps"))).over(wb))
            names.append(name)
            prev = name
    # running mins are non-increasing per bucket → per-bucket min == the
    # value at the bucket's last row == the bucket's final cascade state
    summary = df.groupBy(user_col, "_fbkt").agg(
        *[F.min(c).alias(c) for c in names]
    )

    user_field = events.schema[user_col]
    fold_schema = T.StructType(
        [user_field]
        + [T.StructField(f"_t{j}", T.DoubleType()) for j in range(k)]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_fbkt", kind="mergesort")
        state: list = [None] * k
        c = 0
        for _, row in pdf.iterrows():
            if c == k:
                break
            for j in range(c, k):
                v = row[f"_e{c}s{j}"]
                if pd.isna(v):
                    break
                state[j] = float(v)
            while c < k and state[c] is not None:
                c += 1
        return pd.DataFrame(
            [[pdf[user_col].iat[0]] + state],
            columns=[user_col] + [f"_t{j}" for j in range(k)],
        )

    folded = summary.groupBy(user_col).applyInPandas(fold, schema=fold_schema)
    # users with zero step-type events still appear (steps_completed 0).
    # eqNullSafe: the unsplit path's groupBy keeps a NULL user as an
    # ordinary group, so the join back must match it too (a plain
    # equi-join would report that user as steps_completed=0).
    all_users = events.select(F.col(user_col)).distinct()
    folded_r = folded.withColumnRenamed(user_col, "_fuser")
    out = all_users.join(
        folded_r, F.col(user_col).eqNullSafe(F.col("_fuser")), how="left"
    )
    completed = sum(
        F.when(F.col(f"_t{j}").isNotNull(), 1).otherwise(0) for j in range(k)
    )
    return out.select(
        F.col(user_col),
        completed.cast("long").alias("steps_completed"),
        *[
            F.round(F.col(f"_t{j}") * 1e6).cast("long").alias(f"t{j + 1}_micro")
            for j in range(k)
        ],
    )
