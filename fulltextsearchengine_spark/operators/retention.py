"""Cohort retention over the events stream — "of the users who signed
up in week W, what fraction were active k weeks later" — the third leg
of the event-analytics tripod next to sessionization and funnels.

Semantics (deterministic):
  - a user's cohort is the ISO week (Monday-truncated date) of their
    EARLIEST ``cohort_event`` event; users who never emit it are out;
  - a user is active in a week if they emit ANY event that week;
  - ``week_offset`` = (activity week - cohort week) / 7 days; negative
    offsets (activity before the cohort event) are kept — they are real
    signal (pre-signup activity) and dropping them silently would make
    offset-0 look like the first week of life;
  - ``retention_ppm`` = active users / cohort size, parts-per-million.

Plan shape at 100 TB: one groupBy(user) for first-touch, one
distinct(user, week) for activity (both partial-aggregated map-side),
an equi-join on user_id — the same key both aggs just shuffled on, so
the exchange is reused — and a final groupBy on (cohort, offset) whose
cardinality is weeks², a driver-sized frame. No windows, no skew
hazard beyond a hot user collapsing to ≤ weeks rows before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_report(
    events: DataFrame,
    cohort_event: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(cohort_week, week_offset, n_active, cohort_size, retention_ppm)
    — one row per (cohort, offset) pair observed; cohort_week is the
    Monday date string 'yyyy-MM-dd'."""
    first = (
        events.filter(F.col(type_col) == F.lit(cohort_event))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t0"))
        .withColumn("_cw", F.date_trunc("week", F.col("_t0")).cast("date"))
    )
    acts = events.select(
        F.col(user_col),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("_aw"),
    ).distinct()
    sizes = first.groupBy("_cw").agg(F.count("*").alias("cohort_size"))
    cells = (
        acts.join(first.select(user_col, "_cw"), user_col)
        .withColumn(
            "week_offset",
            (F.datediff(F.col("_aw"), F.col("_cw")) / 7).cast("long"),
        )
        .groupBy("_cw", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )
    return (
        cells.join(F.broadcast(sizes), "_cw")
        .select(
            F.date_format("_cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size") * 1e6)
            .cast("long")
            .alias("retention_ppm"),
        )
    )
