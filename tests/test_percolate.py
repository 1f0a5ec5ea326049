"""Percolation: stored-query matching vs brute force, index/turns path
parity, streaming micro-batch parity, and registry guards."""

from __future__ import annotations

import re

import pytest

from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.percolate import (
    StoredQuery,
    percolate_index,
    percolate_turns,
)
from fulltextsearchengine_spark.sources.rawlog import TRANSCRIPT_SCHEMA

REGISTRY = [
    StoredQuery("alert_and", ("ur", "lwcsf")),
    StoredQuery("alert_msm", ("ur", "lwcsf", "dhkewyg", "nz"), min_should_match=2),
    StoredQuery("alert_role", ("ur",), role="user"),
    StoredQuery("alert_oov", ("zzznotaterm", "ur"), min_should_match=1),
]


def _tok(s):
    return [t.lower() for t in re.split(r"[^A-Za-z0-9]+", s or "") if t]


def _brute(pdf) -> set[tuple[str, str, int, int]]:
    out = set()
    for _, row in pdf.iterrows():
        terms = set(_tok(row["text"]))
        for q in REGISTRY:
            m = len(set(q.terms) & terms)
            if m >= q.required and (q.role is None or q.role == row["role"]):
                out.add((q.query_id, row["conv_id"], int(row["turn_idx"]), m))
    return out


@pytest.fixture(scope="module")
def corpus(spark, small_transcripts_pdf):
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    return small_transcripts_pdf, sdf


def test_percolate_turns_matches_brute(corpus):
    pdf, sdf = corpus
    brute = _brute(pdf)
    got = {
        (r["query_id"], r["conv_id"], r["turn_idx"], r["matched"])
        for r in percolate_turns(sdf, REGISTRY).collect()
    }
    assert got == brute
    fired = {q for q, *_ in brute}
    assert {"alert_and", "alert_msm", "alert_role", "alert_oov"} <= fired


def test_percolate_index_parity_with_turns(corpus):
    pdf, sdf = corpus
    idx = build_index(sdf)
    key_of = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"] for r in idx.docs.collect()
    }
    from_turns = {
        (r["query_id"], key_of[(r["conv_id"], r["turn_idx"])], r["matched"])
        for r in percolate_turns(sdf, REGISTRY).collect()
    }
    from_index = {
        (r["query_id"], r["doc_id"], r["matched"])
        for r in percolate_index(idx, REGISTRY).collect()
    }
    assert from_index == from_turns


def test_percolate_stream_parity(corpus, spark, tmp_path_factory):
    pdf, sdf = corpus
    d = tmp_path_factory.mktemp("percolate")
    input_dir, ckpt = str(d / "in"), str(d / "ckpt")
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half], schema=TRANSCRIPT_SCHEMA).write.mode(
        "append"
    ).parquet(input_dir)
    spark.createDataFrame(pdf.iloc[half:], schema=TRANSCRIPT_SCHEMA).write.mode(
        "append"
    ).parquet(input_dir)

    collected = []
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)

    def sink(batch_df, batch_id):
        collected.extend(percolate_turns(batch_df, REGISTRY).collect())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["query_id"], r["conv_id"], r["turn_idx"], r["matched"]) for r in collected
    }
    assert got == _brute(pdf)


def test_registry_guards():
    with pytest.raises(ValueError):
        StoredQuery("empty", ())
    with pytest.raises(ValueError):
        StoredQuery("badmsm", ("a", "b"), min_should_match=3)
    from fulltextsearchengine_spark.operators.percolate import _query_frame

    with pytest.raises(ValueError):
        _query_frame(None, [StoredQuery("x", ("a",)), StoredQuery("x", ("b",))])
