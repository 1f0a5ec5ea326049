"""Deterministic global training order ("epoch shuffle").

Training pipelines need the corpus in a pseudorandom but REPRODUCIBLE
order: the same seed must yield the same sequence on any cluster size,
any partitioning, any engine, so a resumed/re-run job reads the same
curriculum. ``df.orderBy(rand(seed))`` fails all of that — Spark's
``rand`` is seeded per-partition, so the order changes with the
partition layout.

Here the sort key is ``md5(seed || ':' || row-key)`` — a pure function
of the row, like the stratified-sample keep rule (operators/sampling.py)
— and the epoch position is the global rank in (hash, key) order.

Scale shape (same two-pass rank as docID assignment, operators/
docid.py, which oracle-pins the pattern): one range exchange on the
hash (sampled boundaries), per-partition sort + stamped
``monotonically_increasing_id``, a P-row driver prefix-sum, then a pure
projection. No global single-task window at any point. Different seeds
give statistically independent permutations (new hash = new total
order), which is exactly one epoch's shuffle.

The reference engine has no training-order surface; this extends the
training-data-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def global_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    rank_col: str,
    num_partitions: int | None = None,
    storage_level: StorageLevel | None = None,
) -> DataFrame:
    """Add ``rank_col`` = dense 1-based global rank in ``order_cols``
    order. ``order_cols`` must be a unique total order (append a
    tiebreaker key if not) — uniqueness is what makes the result
    independent of where the range partitioner draws boundaries.

    Two-pass: range-partition + in-partition sort + stamped id →
    P-row driver prefix-sum → projection (see operators/docid.py for
    the measured rationale vs a row_number window)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.conf.get("spark.sql.shuffle.partitions")
    num_partitions = int(num_partitions)

    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    )
    part_rows = (
        ranged.groupBy(F.shiftright("_mid", 33).alias("_pid"))
        .agg(F.min("_mid").alias("mn"), F.count("*").alias("cnt"))
        .collect()
    )
    adj, acc = {}, 0
    for r in sorted(part_rows, key=lambda r: r["_pid"]):
        adj[r["_pid"]] = acc + 1 - r["mn"]
        acc += r["cnt"]
    if adj:
        adj_map = F.create_map(*[F.lit(x) for kv in adj.items() for x in kv])
        adj_expr = adj_map[F.shiftright("_mid", 33)].cast("long")
    else:
        adj_expr = F.lit(1).cast("long")
    out = ranged.withColumn(rank_col, F.col("_mid") + adj_expr).drop("_mid")
    out._ftse_persisted = ranged
    return out


def shuffle_key(key_col: str, seed: int) -> Column:
    """The per-row epoch-shuffle sort key: md5 of ``seed:key``."""
    return F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))


def training_order(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 0,
    pos_col: str = "epoch_pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """(+) ``pos_col``: the row's 1-based position in the seed's global
    pseudorandom order. ``key_col`` must be unique (it breaks hash-
    collision ties, making the order total).

    A consumer materializes one epoch with
    ``training_order(df, seed=epoch).sortWithinPartitions(pos_col)``
    written bucketed by ``pos_col`` range — readers then stream the
    corpus in epoch order with no further shuffle."""
    out = global_rank(
        df.withColumn("_shuf", shuffle_key(key_col, seed)),
        ["_shuf", key_col],
        pos_col,
        num_partitions=num_partitions,
    )
    persisted = out._ftse_persisted
    out = out.drop("_shuf")
    out._ftse_persisted = persisted
    return out
