"""Gap-based sessionization of the events stream — the classic
clickstream/agent-activity operator: split each user's event sequence
into sessions wherever the inter-event gap exceeds a threshold, then
aggregate per session.

The reference engine has no event surface at all; a transcript warehouse
always ships one next to the text index (the driver's ``events`` table:
event_id, ts, user_id, event_type, value, props). Sessionization is the
first derived table every activity dashboard builds on.

Semantics (deterministic):
  - events of one user are ordered by (ts, event_id) — event_id breaks
    timestamp ties so the session split is total-order stable;
  - a session starts at the first event and after every gap STRICTLY
    greater than ``gap_seconds``;
  - ``session_idx`` is 1-based per user in time order.

Plan shape at 100 TB: ONE shuffle on user_id (the window partition key),
then two in-partition window passes (lag + running sum) and a partial
(user, session) agg — exactly the shape Spark executes as
Window[user_id] with no global ordering anywhere. Skew note: a single
hyperactive user's events land in one task; if a user can exceed a
task's memory, pre-split by (user_id, day) and stitch boundary sessions
— not needed for human/agent-scale activity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_s(col: F.Column) -> F.Column:
    """Seconds-with-fraction epoch. The intermediate timestamp cast makes
    TIMESTAMP_NTZ inputs work too (NTZ→double is not castable directly);
    the session runs UTC, so NTZ wall-clock == epoch, matching DuckDB's
    epoch() on naive timestamps."""
    return col.cast("timestamp").cast("double")


def sessionize(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Input events + (session_idx, is_session_start) — every event
    tagged with its user-local 1-based session number."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    ts_s = _epoch_s(F.col(ts_col))
    gap = ts_s - F.lag(ts_s).over(w)
    is_start = F.when(
        gap.isNull() | (gap > F.lit(float(gap_seconds))), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn("is_session_start", is_start).withColumn(
        "session_idx",
        F.sum("is_session_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_idx, start_ts, end_ts, duration_sec, n_events,
    n_event_types, sum_value_micro): one row per session."""
    tagged = sessionize(events, gap_seconds, user_col, ts_col, id_col)
    return tagged.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.floor(F.max(_epoch_s(F.col(ts_col))) - F.min(_epoch_s(F.col(ts_col))))
        .cast("long")
        .alias("duration_sec"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.round(F.sum(value_col) * 1e6).cast("long").alias("sum_value_micro"),
    )
