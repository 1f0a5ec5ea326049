"""Chunking + sequence packing (operators/chunking)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _df(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens → 3 chunks at (4,1)
        (2, "a b c"),                               # shorter than a window → 1 chunk
        (3, ""),                                    # empty → no chunks
        (4, "x " * 4),                              # exactly one window
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_overlap(spark):
    from fulltextsearchengine_spark.operators.chunking import chunk_documents

    out = chunk_documents(_df(spark), chunk_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    assert {d for d, _ in rows} == {1, 2, 4}  # empty doc 3 gone
    # doc 1: 10 tokens, step 3 → 1+ceil(6/3) = 3 windows [0:4],[3:7],[6:10]
    d1 = sorted((ci, rows[(1, ci)]["chunk_text"]) for ci in range(5) if (1, ci) in rows)
    assert [c for c, _ in d1] == [0, 1, 2]
    assert d1[0][1] == "t0 t1 t2 t3"
    assert d1[1][1] == "t3 t4 t5 t6"  # 1-token overlap
    assert d1[2][1] == "t6 t7 t8 t9"  # final window reaches the last token
    assert rows[(2, 0)]["chunk_text"] == "a b c" and (2, 1) not in rows
    assert rows[(4, 0)]["n_chunk_tokens"] == 4 and (4, 1) not in rows


def test_chunk_bad_overlap_rejected(spark):
    from fulltextsearchengine_spark.operators.chunking import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(_df(spark), chunk_tokens=4, overlap=4)


def test_pack_budget_overflow_bounded(spark):
    from fulltextsearchengine_spark.operators.chunking import chunk_documents, pack_chunks

    texts = [(i, " ".join(f"w{i}_{j}" for j in range(13))) for i in range(20)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    chunks = chunk_documents(df, chunk_tokens=5, overlap=0)  # 13 → 5,5,3 per doc
    packed = pack_chunks(chunks, budget_tokens=12, pack_key=None)
    agg = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_chunk_tokens").alias("tot"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # greedy-with-overflow: every pack holds ≥ budget-5+1 … ≤ budget+4
    for r in agg:
        assert r["tot"] <= 12 + 4  # overflow bounded by one chunk - 1
    # chunks preserve order within packs: exclusive running total monotone
    rows = packed.orderBy("doc_id", "chunk_idx").collect()
    assert [r["pack_ord"] for r in rows] == sorted(r["pack_ord"] for r in rows)


def test_pack_partitioned_by_key(spark):
    from fulltextsearchengine_spark.operators.chunking import chunk_documents, pack_chunks

    df = spark.createDataFrame(
        [(i, "one two three four five six") for i in range(8)], "doc_id long, text string"
    )
    chunks = chunk_documents(df, chunk_tokens=6, overlap=0).withColumn(
        "grp", (F.col("doc_id") % 2).cast("string")
    )
    packed = pack_chunks(chunks, budget_tokens=12, pack_key="grp")
    # each group packs independently from ord 0
    firsts = (
        packed.groupBy(F.split("pack_id", "#")[0].alias("g"))
        .agg(F.min("pack_ord").alias("mn"))
        .collect()
    )
    assert all(r["mn"] == 0 for r in firsts) and len(firsts) == 2
