"""Dense 1-based docID assignment over stable (conv_id, turn_idx) order.

Reference analog: sequential arrival-order docID counter
(IndexWriter.java:47-58, SURVEY.md §2.2 P5). The distributed analog must
NOT be `monotonically_increasing_id` (not dense) nor a single global
`row_number()` window (serializes all data through one task at scale).

Scalable two-pass design (§7.1 step 3):
  1. range-partition by (conv_id, turn_idx), sort WITHIN partitions
     (narrow — no extra exchange), stamp `monotonically_increasing_id`
     (consecutive per partition: pid·2³³ + row index) → persist;
  2. per-partition (min id, count) — one tiny job, P rows to driver;
  3. driver prefix-sum → per-partition adjustment (P entries, literal map);
  4. doc_id = stamped id + adjustment[pid] — a PURE PROJECTION.

Earlier revisions ranked with `row_number() OVER (PARTITION BY _pid)`,
which forces a second full-corpus hash exchange + sort in every
consuming job (Catalyst can't prove range partitioning satisfies the
window's clustering) — measured as a non-scaling chunk of the build's
postings stage (BENCH/BASELINE.md). The stamped-id form keeps pass 2
narrow: zero exchanges downstream of the persist.

The output is deterministic regardless of where the range partitioner
draws boundaries, because (conv_id, turn_idx) is a unique key: doc_id is
the global rank in that total order (the in-partition sort is
deterministic, so the stamped ids are too, even on cache recompute).
Correctness is oracle-checked against a single
`ROW_NUMBER() OVER (ORDER BY conv_id, turn_idx)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from .ordering import global_rank


def assign_doc_ids(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    storage_level: StorageLevel | None = None,
) -> DataFrame:
    """Add a dense 1-based ``doc_id`` column ranked by (conv_id, turn_idx).

    At 100 TB this runs as: one range-exchange (sampled boundaries), one
    count job, and one narrow map with a per-partition sort — no global
    single-task window. The generic two-pass rank lives in
    ``ordering.global_rank`` (also the epoch-shuffle engine); this is
    its docID instantiation.

    ``storage_level``: the ranged frame (the FULL corpus) is persisted
    across the two passes. Default MEMORY_AND_DISK (spills under
    pressure) is right when the corpus fits the cluster; pass
    ``StorageLevel.DISK_ONLY`` for at-scale runs where caching the whole
    input would evict everything else from executor memory for a
    read-exactly-twice frame.
    """
    return global_rank(
        transcripts,
        ["conv_id", "turn_idx"],
        "doc_id",
        num_partitions=num_partitions,
        storage_level=storage_level,
    )
