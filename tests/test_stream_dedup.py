"""Streaming dedup: cross-batch exact dedup state, simhash near-dup
state, and pandas/Catalyst simhash bit-parity."""

from __future__ import annotations

import pandas as pd
import pytest

from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def _write_batch(spark, pdf, input_dir):
    spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).write.mode("append").parquet(input_dir)


def _run_stream(spark, input_dir, transform, ckpt):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = (
        transform(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def _mk(rows):
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32"})


def test_pandas_simhash_matches_catalyst(spark):
    from fulltextsearchengine_spark.operators.dedup import simhash64
    from fulltextsearchengine_spark.streaming.stream_dedup import simhash64_py

    texts = [
        "the quick brown fox JUMPS over the lazy dog",
        "punctuation, SEPARATED?! tokens -- here 123",
        "",
        "repeated repeated repeated token token",
        "Ωmega 데이터 non-ascii dropped",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    catalyst = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    for i, t in enumerate(texts):
        assert simhash64_py(t) == catalyst.get(i, simhash64_py(t)), t


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    from fulltextsearchengine_spark.streaming.stream_dedup import streaming_exact_dedup

    ts = pd.Timestamp("2026-01-01")
    input_dir = str(tmp_path / "in")
    # batch 1: two distinct texts, one internal dup
    _write_batch(spark, _mk([
        ("c1", 0, "user", "hello world", None, ts),
        ("c1", 1, "assistant", "HELLO,  world!", None, ts),  # canonical dup of row 0
        ("c2", 0, "user", "something else", None, ts),
    ]), input_dir)
    r1 = _run_stream(spark, input_dir, streaming_exact_dedup, str(tmp_path / "ck1"))
    assert len(r1) == 2  # internal dup dropped

    # batch 2: a cross-batch dup + a new text — state must remember batch 1
    _write_batch(spark, _mk([
        ("c3", 0, "user", "hello world", None, ts),       # dup of batch-1 row
        ("c3", 1, "user", "genuinely new text", None, ts),
    ]), input_dir)
    r2 = _run_stream(spark, input_dir, streaming_exact_dedup, str(tmp_path / "ck1"))
    texts = [r["text"] for r in r2]
    assert texts == ["genuinely new text"]


def test_streaming_simhash_dedup_near_duplicates(spark, tmp_path):
    from fulltextsearchengine_spark.streaming.stream_dedup import (
        simhash64_py,
        streaming_simhash_dedup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet empty street tonight"
    )
    near = base + " yes"  # one extra token → hamming 1, same 8-bit prefix
    import numpy as np

    d = bin((simhash64_py(base) ^ simhash64_py(near)) & ((1 << 64) - 1)).count("1")
    assert 0 < d <= 3, f"fixture needs a near pair, got hamming {d}"
    far = "completely different content about spark sql query optimization plans"

    ts = pd.Timestamp("2026-01-01")
    input_dir = str(tmp_path / "in")
    _write_batch(spark, _mk([("c1", 0, "user", base, None, ts),
                             ("c2", 0, "user", far, None, ts)]), input_dir)
    tr = lambda s: streaming_simhash_dedup(s, max_hamming=3)
    r1 = _run_stream(spark, input_dir, tr, str(tmp_path / "ck"))
    assert sorted(r["text"] for r in r1) == sorted([base, far])

    # batch 2: near-dup of base (suppressed by state) + exact far dup
    # (suppressed) + new far-away text (kept)
    _write_batch(spark, _mk([("c3", 0, "user", near, None, ts),
                             ("c3", 1, "user", far, None, ts),
                             ("c4", 0, "user", "yet another unrelated document entirely", None, ts)]), input_dir)
    r2 = _run_stream(spark, input_dir, tr, str(tmp_path / "ck"))
    assert [r["text"] for r in r2] == ["yet another unrelated document entirely"]
