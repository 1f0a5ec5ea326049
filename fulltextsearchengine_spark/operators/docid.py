"""Dense 1-based docID assignment over stable (conv_id, turn_idx) order.

Reference analog: sequential arrival-order docID counter
(IndexWriter.java:47-58, SURVEY.md §2.2 P5). The distributed analog must
NOT be `monotonically_increasing_id` (not dense) nor a single global
`row_number()` window (serializes all data through one task at scale).

Scalable two-pass design (§7.1 step 3):
  1. range-partition by (conv_id, turn_idx) → P sorted partitions;
  2. count rows per partition (one tiny job over the persisted frame);
  3. driver prefix-sum → per-partition offsets (P entries, broadcast);
  4. row_number within partition + offset.

The output is deterministic regardless of where the range partitioner
draws boundaries, because (conv_id, turn_idx) is a unique key: doc_id is
the global rank in that total order. Correctness is oracle-checked
against a single `ROW_NUMBER() OVER (ORDER BY conv_id, turn_idx)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def assign_doc_ids(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    storage_level: StorageLevel | None = None,
) -> DataFrame:
    """Add a dense 1-based ``doc_id`` column ranked by (conv_id, turn_idx).

    At 100 TB this runs as: one range-exchange (sampled boundaries), one
    count job, and one narrow map with a per-partition sort — no global
    single-task window.

    ``storage_level``: the ranged frame (the FULL corpus) is persisted
    across the two passes. Default MEMORY_AND_DISK (spills under
    pressure) is right when the corpus fits the cluster; pass
    ``StorageLevel.DISK_ONLY`` for at-scale runs where caching the whole
    input would evict everything else from executor memory for a
    read-exactly-twice frame.
    """
    spark = transcripts.sparkSession
    if num_partitions is None:
        num_partitions = spark.conf.get("spark.sql.shuffle.partitions")
    num_partitions = int(num_partitions)

    ranged = (
        transcripts.repartitionByRange(num_partitions, "conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
        .persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    )
    # pass 1: per-partition counts (tiny: P rows to the driver)
    counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        offset_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        offset_expr = offset_map[F.col("_pid")].cast("long")
    else:  # empty input: untyped map() literal would fail analysis
        offset_expr = F.lit(0).cast("long")

    # pass 2: rank within each range partition. The window's partitionBy
    # keeps parallelism at P tasks; ordering only sorts within a partition.
    w = Window.partitionBy("_pid").orderBy("conv_id", "turn_idx")
    out = ranged.withColumn(
        "doc_id", (F.row_number().over(w).cast("long") + offset_expr)
    ).drop("_pid")
    # expose the persisted frame so callers can unpersist once consumed
    out._ftse_persisted = ranged
    return out
