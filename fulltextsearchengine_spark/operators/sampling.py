"""Deterministic stratified sampling for training-data mixture control.

A 100-TB corpus is mixed from sources at different rates (web 10%, code
50%, books 100%, ...). ``df.sample()`` is seed-dependent on partition
layout and not reproducible across engines/runs; here the keep decision
is a pure function of the ROW KEY: keep row iff the first 8 hex chars of
``md5(key)`` are lexicographically below the stratum's threshold
``hex(floor(rate * 16^8))``. The same row is kept at every cluster size,
partitioning, and engine — the sample is a deterministic, idempotent
view, and raising a stratum's rate strictly GROWS its sample (nested
samples, the property you need for data-ablation curves).

Scale shape: a pure map + filter over the scan (zero shuffles, zero
Python); the report is one groupBy over the strata (tiny cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX_SPACE = 16**8


def rate_threshold(rate: float) -> str:
    """8-hex-char lexicographic threshold for a keep rate in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g"  # > every hex char; keeps all rows
    return format(int(rate * HEX_SPACE), "08x")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s iff md5(key)[:8] < threshold(rates[s]).

    ``key_col`` must identify the row (e.g. doc_id); the hash is taken
    over its string form. Strata missing from ``rates`` use
    ``default_rate`` (0.0 = drop unknown sources — the safe default for
    a curated training mix)."""
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    thr = F.lit(rate_threshold(default_rate))
    expr = None
    for stratum in sorted(rates):
        cond = F.col(strata_col) == stratum
        t = F.lit(rate_threshold(rates[stratum]))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thr = expr.otherwise(thr) if expr is not None else thr
    return df.where(h < thr)


def sample_report(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum audit: total rows, kept rows, realized keep fraction
    (micro), and the resampling weight (micro) a loss-reweighting
    consumer would apply (total/kept; 0 when nothing kept). One scan +
    one tiny aggregation."""
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    thr = F.lit(rate_threshold(default_rate))
    expr = None
    for stratum in sorted(rates):
        cond = F.col(strata_col) == stratum
        t = F.lit(rate_threshold(rates[stratum]))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thr = expr.otherwise(thr) if expr is not None else thr
    kept = F.when(h < thr, 1).otherwise(0)
    return (
        df.groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept).cast("long").alias("n_kept"),
        )
        .withColumn(
            "kept_frac_micro",
            F.round(F.col("n_kept") / F.col("n_total") * 1e6).cast("long"),
        )
        .withColumn(
            "weight_micro",
            F.when(
                F.col("n_kept") > 0,
                F.round(F.col("n_total") / F.col("n_kept") * 1e6),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float],
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, split): deterministic disjoint train/valid/test
    assignment by hashed id — the split is a pure function of
    (seed, id), so it is stable across runs, engines, repartitioning,
    and INCREMENTAL corpus growth (a doc keeps its split when new data
    arrives — the property random splits lose and the reason every
    production pipeline hashes instead of sampling).

    u = md5_52(seed, id) / 2^52 ∈ [0, 1); split = the first name whose
    cumulative fraction exceeds u (names in the dict's order). The
    fractions must sum to 1 (±1e-9). Pure map — zero shuffles.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    h52 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    u = h52 / F.lit(float(1 << 52))
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return docs.select(F.col(id_col), split.alias("split"))
