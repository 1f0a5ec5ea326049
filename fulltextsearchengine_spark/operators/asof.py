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

Skew note: all rows of one key land in one task (window partition) by
default. When a single key can exceed task memory (a bot/system account
emitting 10^9 events), pass ``split_bucket_seconds``: both sides are
pre-split by (key, coarse time bucket), the running-last window runs
per bucket, and each bucket is seeded with the latest right row of all
previous buckets — a tiny per-key-per-bucket stitch table (the standard
boundary stitch). Value-identical to the unsplit path; costs one extra
small shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessions import _epoch_s

_RESERVED = (
    "_akey", "_aeps", "_side", "_atie", "_apay", "_arow", "_am",
    "_abkt", "_ablast", "_acarry", "_ack", "_acb", "asof_lag_sec",
)


def _tie_cast_type(dtype: str) -> str:
    """SQL type the tie-break column is normalized to.

    Integral ids stay bigint — casting a long id > 2^53 to double loses
    precision and can flip equal-timestamp tie-breaks vs an exact
    integer ORDER BY (advice r4). Decimals keep their own exact type for
    the same reason (decimal(38,0) ids > 2^53 are exact, double is not).
    Floats compare as double, strings lexicographically; anything else
    (timestamp, date, bool) keeps its own orderable type.
    """
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return "bigint"
    if dtype in ("float", "double"):
        return "double"
    if dtype == "string":
        return "string"
    return dtype


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
    split_bucket_seconds: float | None = None,
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
    ``split_bucket_seconds``: opt-in hot-key pre-split (see module
    docstring) — partition the window by (key, floor(ts/bucket)) and
    stitch bucket boundaries; value-identical, bounds task memory by
    rows-per-bucket instead of rows-per-key.
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
    if split_bucket_seconds is not None and split_bucket_seconds <= 0:
        raise ValueError("split_bucket_seconds must be > 0")
    reserved_hit = (set(left.columns) | set(right.columns)) & set(_RESERVED)
    if reserved_hit:
        raise ValueError(
            f"input columns collide with asof_join internals "
            f"{sorted(reserved_hit)}; rename them"
        )

    payload = F.struct(
        _epoch_s(F.col(right_ts)).alias("_ats"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    # tie column keeps right_id's natural ordering (see _tie_cast_type)
    tie_type = _tie_cast_type(dict(right.dtypes)[right_id])
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
    scan_ord = [
        F.asc(F.col("_aeps") * F.lit(sign)),
        F.asc("_side"),
        F.asc("_atie"),
    ]
    if split_bucket_seconds is None:
        w = (
            Window.partitionBy("_akey")
            .orderBy(*scan_ord)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = u.withColumn("_am", F.last("_apay", ignorenulls=True).over(w))
    else:
        # Hot-key pre-split: bucket on the sign-multiplied epoch so bucket
        # ids increase in scan order for both directions, run the running
        # last per (key, bucket), and seed each bucket with the latest
        # right payload of all PREVIOUS buckets (the carry-in). The carry
        # table has one row per (key, bucket) — tiny — so its per-key
        # window cannot skew even when one key owns 10^9 events.
        bw = float(split_bucket_seconds)
        u = u.withColumn(
            "_abkt",
            F.floor(F.col("_aeps") * F.lit(sign) / F.lit(bw)).cast("long"),
        )
        wb = (
            Window.partitionBy("_akey", "_abkt")
            .orderBy(*scan_ord)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        within = F.last("_apay", ignorenulls=True).over(wb)
        # Last right payload of each (key, bucket): max over the same
        # (order, tie) the scan uses; struct comparison is field-wise so
        # this picks exactly the row the running last would end on.
        blast = (
            u.filter(F.col("_side") == 0)
            .groupBy("_akey", "_abkt")
            .agg(
                F.max_by(
                    "_apay",
                    F.struct(
                        (F.col("_aeps") * F.lit(sign)).alias("o"),
                        F.col("_atie").alias("t"),
                    ),
                ).alias("_ablast")
            )
        )
        buckets = u.select("_akey", "_abkt").distinct()
        wc = (
            Window.partitionBy("_akey")
            .orderBy("_abkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # Null-safe joins: Window.partitionBy treats NULL _akey (and a
        # NULL _abkt from a NULL timestamp) as an ordinary group, so the
        # unsplit path matches across them; plain equi-joins would lose
        # the carry-in for those groups and diverge. eqNullSafe keys stay
        # hash/sort-merge joinable.
        blast_r = blast.withColumnRenamed("_akey", "_ack").withColumnRenamed(
            "_abkt", "_acb"
        )
        carry = (
            buckets.join(
                blast_r,
                F.col("_akey").eqNullSafe(F.col("_ack"))
                & F.col("_abkt").eqNullSafe(F.col("_acb")),
                how="left",
            )
            .withColumn(
                "_acarry", F.last("_ablast", ignorenulls=True).over(wc)
            )
            .select("_akey", "_abkt", "_acarry")
            .withColumnRenamed("_akey", "_ack")
            .withColumnRenamed("_abkt", "_acb")
        )
        out = (
            u.join(
                carry,
                F.col("_akey").eqNullSafe(F.col("_ack"))
                & F.col("_abkt").eqNullSafe(F.col("_acb")),
                how="left",
            )
            .withColumn("_am", F.coalesce(within, F.col("_acarry")))
        )
    out = out.filter(F.col("_arow").isNotNull())
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
