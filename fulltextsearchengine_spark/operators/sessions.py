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
Window[user_id] with no global ordering anywhere.

Skew: by default a single hyperactive user's events land in one task.
When a key can exceed task memory (a bot/system account), pass
``split_bucket_seconds``: the window partitions by (user, coarse time
bucket) so per-task rows are bounded by rows-per-bucket, and bucket
boundaries are stitched through a tiny per-(user, bucket) summary table
— a bucket whose first event is within ``gap_seconds`` of the previous
bucket's last event continues that session (its local session 1 merges),
and later buckets renumber by the running count of stitched sessions.
Value-identical to the unsplit path (pytest-locked); costs one extra
bucket-count-sized shuffle.
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
    split_bucket_seconds: float | None = None,
) -> DataFrame:
    """Input events + (session_idx, is_session_start) — every event
    tagged with its user-local 1-based session number.

    ``split_bucket_seconds``: opt-in hot-key pre-split (module
    docstring) — value-identical, bounds task memory by rows-per-bucket
    instead of rows-per-key.
    """
    if split_bucket_seconds is not None:
        if split_bucket_seconds <= 0:
            raise ValueError("split_bucket_seconds must be > 0")
        return _sessionize_split(
            events, float(gap_seconds), user_col, ts_col, id_col,
            float(split_bucket_seconds),
        )
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


def _sessionize_split(
    events: DataFrame,
    gap_seconds: float,
    user_col: str,
    ts_col: str,
    id_col: str,
    bw: float,
) -> DataFrame:
    """(user, time-bucket)-partitioned sessionize + boundary stitch.

    Within each bucket the plain lag/running-sum pass yields local
    session numbers. A per-(user, bucket) summary (first/last event
    epoch, local session count) is tiny — one row per non-empty bucket —
    so its per-user window cannot skew; it decides for each bucket
    whether its first local session CONTINUES the previous bucket's last
    session (boundary gap <= gap_seconds) and the cumulative offset of
    completed sessions before it. Joined back on (user, bucket):
    ``global_idx = offset + local_idx - continues`` and the first event
    of a continuing bucket loses its is_session_start flag.
    """
    reserved = {"_sbkt", "_seps", "_sloc", "_soff", "_scont", "_sstart",
                "_suser", "_sbkt2"}
    clash = set(events.columns) & reserved
    if clash:
        raise ValueError(
            f"input columns collide with sessionize internals {sorted(clash)}"
        )
    ts_s = _epoch_s(F.col(ts_col))
    e = events.withColumn("_seps", ts_s).withColumn(
        "_sbkt", F.floor(F.col("_seps") / F.lit(bw)).cast("long")
    )
    wb = Window.partitionBy(user_col, "_sbkt").orderBy(
        F.asc(ts_col), F.asc(id_col)
    )
    gap = F.col("_seps") - F.lag("_seps").over(wb)
    local_start = F.when(
        gap.isNull() | (gap > F.lit(gap_seconds)), F.lit(1)
    ).otherwise(F.lit(0))
    e = e.withColumn("_sstart", local_start).withColumn(
        "_sloc",
        F.sum("_sstart").over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    summary = e.groupBy(user_col, "_sbkt").agg(
        F.min("_seps").alias("_first"),
        F.max("_seps").alias("_last"),
        F.max("_sloc").alias("_nloc"),
    )
    wu = Window.partitionBy(user_col).orderBy("_sbkt")
    cont = F.when(
        (F.col("_first") - F.lag("_last").over(wu)) <= F.lit(gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    summary = summary.withColumn("_scont", cont).withColumn(
        "_soff",
        F.coalesce(
            F.sum(F.col("_nloc") - F.col("_scont")).over(
                wu.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    # Null-safe stitch join: Window.partitionBy groups NULL users (and
    # NULL-ts rows, whose _sbkt is NULL) into a partition like any other
    # key, so the join back must match them too — a plain equi-join
    # would silently DROP those rows and diverge from the unsplit path.
    # eqNullSafe keys still hash/sort-merge join (no nested loop).
    sa = (
        summary.select(user_col, "_sbkt", "_scont", "_soff")
        .withColumnRenamed(user_col, "_suser")
        .withColumnRenamed("_sbkt", "_sbkt2")
    )
    out = e.join(
        sa,
        F.col(user_col).eqNullSafe(F.col("_suser"))
        & F.col("_sbkt").eqNullSafe(F.col("_sbkt2")),
        how="inner",
    )
    is_start = F.when(
        (F.col("_scont") == 1) & (F.col("_sloc") == 1), F.lit(0)
    ).otherwise(F.col("_sstart"))
    return (
        out.withColumn(
            "session_idx",
            (F.col("_soff") + F.col("_sloc") - F.col("_scont")).cast("long"),
        )
        .withColumn("is_session_start", is_start)
        .select(*events.columns, "is_session_start", "session_idx")
    )


def session_stats(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    split_bucket_seconds: float | None = None,
) -> DataFrame:
    """(user_id, session_idx, start_ts, end_ts, duration_sec, n_events,
    n_event_types, sum_value_micro): one row per session."""
    tagged = sessionize(
        events, gap_seconds, user_col, ts_col, id_col,
        split_bucket_seconds=split_bucket_seconds,
    )
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
