"""Point-in-interval range join — "which events fall inside which time
windows" — expressed as an equi-join Spark can shuffle-partition,
never as the inequality theta-join Catalyst would execute as
BroadcastNestedLoopJoin (a cartesian product that dies at scale).

The bucketed-range-join pattern (the task brief names range joins as a
custom operator; Databricks ships the same trick as a join hint):
  - each interval explodes to the fixed-width time buckets it overlaps
    (``sequence(floor(start/w), floor(end/w))``);
  - each point has exactly ONE bucket (``floor(ts/w)``);
  - equi-join on (key…, bucket), then the exact containment filter.
Because a point owns a single bucket, every (point, interval) pair
meets at most once — no post-join dedup. Cost: the interval side grows
by avg(interval_len / bucket_width + 1); pick ``bucket_seconds`` near
the median interval length so the blow-up is ~2× while each point joins
against only its bucket's intervals, not the whole interval set.

Bounds are closed on both ends (start <= ts <= end), matching interval
tables built from min/max aggregates (e.g. ``sessions.session_stats``
start_ts/end_ts).

Skew: a bucket holding many intervals (a busy hour) fans its points
out over those intervals — that fan-out is the true result size, not a
join artifact. AQE's skew-join split handles a hot bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sessions import _epoch_s


_RESERVED = ("_bucket", "_p_eps", "_s_eps", "_e_eps")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: float,
    keys: list[str] | None = None,
    how: str = "inner",
    max_span_buckets: int | None = 4096,
) -> DataFrame:
    """points' columns + intervals' non-key columns, one output row per
    (point, containing interval). ``keys``: equality columns shared by
    both sides (e.g. user_id) — co-partition the join beyond the time
    bucket. ``how='left'`` keeps pointless points with null interval
    columns (each matched pair still appears once).

    ``max_span_buckets`` guards the interval explode: one interval much
    longer than ``bucket_seconds`` (a year at 7-s buckets) would silently
    fan out to millions of rows. Any interval spanning more than this
    many buckets fails the job with a clear message (``F.raise_error``
    inside the plan — no extra Spark job to check). Pass ``None`` to
    disable when huge spans are genuinely intended.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be > 0")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys = list(keys or [])
    clash = (set(points.columns) & set(intervals.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"points and intervals share non-key columns {sorted(clash)}; "
            "rename one side"
        )
    reserved_hit = (set(points.columns) | set(intervals.columns)) & set(_RESERVED)
    if reserved_hit:
        raise ValueError(
            f"input columns collide with range_join internals {sorted(reserved_hit)}; "
            "rename them"
        )
    bw = float(bucket_seconds)

    s_eps = _epoch_s(F.col(start_col))
    e_eps = _epoch_s(F.col(end_col))
    lo = F.floor(s_eps / F.lit(bw)).cast("long")
    hi = F.floor(e_eps / F.lit(bw)).cast("long")
    if max_span_buckets is not None:
        span = hi - lo + F.lit(1)
        hi = F.when(
            span > F.lit(int(max_span_buckets)),
            F.raise_error(
                F.concat(
                    F.lit(
                        "range_join: interval spans "
                    ),
                    span.cast("string"),
                    F.lit(
                        f" buckets (> max_span_buckets={int(max_span_buckets)}); "
                        f"raise bucket_seconds (={bw}) toward the median interval "
                        "length or pass max_span_buckets=None"
                    ),
                )
            ).cast("long"),
        ).otherwise(hi)
    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(lo, hi))
    ).withColumn("_s_eps", s_eps).withColumn("_e_eps", e_eps)

    p_eps = _epoch_s(F.col(point_ts))
    pt = points.withColumn("_p_eps", p_eps).withColumn(
        "_bucket", F.floor(F.col("_p_eps") / F.lit(bw)).cast("long")
    )

    cond = (F.col("_p_eps") >= F.col("_s_eps")) & (F.col("_p_eps") <= F.col("_e_eps"))
    iv_cols = [c for c in intervals.columns if c not in keys]
    out_cols = [F.col(c) for c in points.columns] + [F.col(c) for c in iv_cols]
    if how == "inner":
        return pt.join(iv, on=keys + ["_bucket"], how="inner").filter(cond).select(*out_cols)
    # left: ONE left join with the containment predicate inside the join
    # condition. Because a point owns exactly one bucket, every matching
    # interval replica meets it there, so match rows are exact and a
    # matchless point null-pads once. (The earlier two-branch anti-join
    # on monotonically_increasing_id evaluated the points subtree twice —
    # nondeterministic upstream partition order could re-id rows between
    # evaluations and corrupt left semantics.)
    pta, iva = pt.alias("_rj_p"), iv.alias("_rj_i")
    jc = F.lit(True)
    for k in keys:
        jc = jc & (F.col(f"_rj_p.`{k}`") == F.col(f"_rj_i.`{k}`"))
    jc = (
        jc
        & (F.col("_rj_p._bucket") == F.col("_rj_i._bucket"))
        & (F.col("_rj_p._p_eps") >= F.col("_rj_i._s_eps"))
        & (F.col("_rj_p._p_eps") <= F.col("_rj_i._e_eps"))
    )
    return pta.join(iva, jc, "left").select(
        *[F.col(f"_rj_p.`{c}`") for c in points.columns],
        *[F.col(f"_rj_i.`{c}`") for c in iv_cols],
    )
