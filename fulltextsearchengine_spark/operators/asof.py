"""As-of join — attach to each left-side row the most recent right-side
row at-or-before it, per key. The canonical time-series/trading join
(pandas ``merge_asof``, kdb ``aj``, DuckDB ``ASOF JOIN``) that Spark's
built-in operators lack; the task brief names it explicitly as a custom
operator to express Spark-first.

Naive formulations are scale-killers: an inequality theta-join
(``l.ts >= r.ts``) becomes a per-key cartesian product, and a windowed
self-join doubles the scan. The shape that survives 100 TB is the
union trick: tag both sides, union them, ONE shuffle on the key, one
in-partition sort, and a running ``last(payload, ignorenulls=True)``
window carries the latest right row forward onto every left row.
Cost = one Exchange + one sort over |L|+|R| rows — identical to what a
sort-merge join would pay, with zero fan-out however many right rows
precede a left row.

Semantics (deterministic):
  - direction is backward-inclusive: the matched right row has
    ``right.ts <= left.ts`` (ties match — right rows sort before left
    rows at equal timestamps);
  - among right rows sharing a timestamp, the one with the greatest
    ``right_id`` wins (latest-written wins, total-order stable);
  - ``tolerance_seconds`` voids matches older than the window
    (``left.ts - right.ts > tolerance`` → null), like pandas
    ``merge_asof(tolerance=)``;
  - unmatched left rows keep null right columns (left-outer).

Skew note: all rows of one key land in one task (window partition). If
a single key can exceed task memory, pre-split by (key, coarse time
bucket) and seed each bucket with the previous bucket's last right row
— the standard stitch; not needed at human/agent key cardinalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessions import _epoch_s


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    right_id: str | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """Left columns + (right_cols each renamed ``<col><suffix>``) +
    ``asof_lag_sec`` (left.ts - matched right.ts, null when unmatched;
    <= 0 under ``direction='forward'``).

    ``right_cols`` defaults to every right column except the key;
    ``right_id`` (a right column, default the first of ``right_cols``)
    breaks equal-timestamp ties — greatest value wins (both directions).
    ``direction``: 'backward' matches the latest right row at-or-before
    each left row; 'forward' the earliest at-or-after (same plan — the
    scan order flips sign, everything else is unchanged).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    sign = 1.0 if direction == "backward" else -1.0
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on]
    if not right_cols:
        raise ValueError("right side must contribute at least one column")
    if right_id is None:
        right_id = right_cols[0]
    if right_id not in right.columns:
        raise ValueError(f"right_id {right_id!r} not in right columns")
    if tolerance_seconds is not None and tolerance_seconds < 0:
        raise ValueError("tolerance_seconds must be >= 0")

    payload = F.struct(
        _epoch_s(F.col(right_ts)).alias("_ats"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    # tie column keeps right_id's natural ordering: numeric ids compare
    # as doubles, string ids lexicographically (ANSI mode forbids a
    # blanket double cast)
    tie_is_str = dict(right.dtypes)[right_id] == "string"
    tie_type = "string" if tie_is_str else "double"
    # _side orders right (0) before left (1) at equal epochs => inclusive
    r_tagged = right.select(
        F.col(on).alias("_akey"),
        _epoch_s(F.col(right_ts)).alias("_aeps"),
        F.lit(0).alias("_side"),
        F.col(right_id).cast(tie_type).alias("_atie"),
        payload.alias("_apay"),
        F.lit(None).cast("long").alias("_arow"),
    )
    lcols = left.columns
    pay_type = r_tagged.schema["_apay"].dataType
    l_tagged = left.select(
        F.col(on).alias("_akey"),
        _epoch_s(F.col(left_ts)).alias("_aeps"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tie_type).alias("_atie"),
        F.lit(None).cast(pay_type).alias("_apay"),
        F.lit(1).cast("long").alias("_arow"),
        *[F.col(c) for c in lcols],
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy("_akey")
        .orderBy(F.asc(F.col("_aeps") * F.lit(sign)), F.asc("_side"), F.asc("_atie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_apay", ignorenulls=True).over(w)
    out = (
        u.withColumn("_am", matched)
        .filter(F.col("_arow").isNotNull())
    )
    if tolerance_seconds is not None:
        out = out.withColumn(
            "_am",
            F.when(
                (F.col("_aeps") - F.col("_am._ats")) * F.lit(sign)
                <= F.lit(float(tolerance_seconds)),
                F.col("_am"),
            ),
        )
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_am.{c}").alias(f"{c}{suffix}") for c in right_cols],
        (F.col("_aeps") - F.col("_am._ats")).alias("asof_lag_sec"),
    )
