"""Hash-threshold distinct sketch: determinism, brute-force identity,
and estimator accuracy on a corpus large enough for the law of large
numbers to bite."""

from __future__ import annotations

import hashlib

import pytest

from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.sketches import (
    corpus_sketch_report,
    hash_threshold_distinct,
)
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

from pyspark.sql import functions as F


def _brute(values, nibble):
    kept = {
        v for v in values
        if hashlib.md5(str(v).encode()).hexdigest()[0] < f"{nibble:x}"
    }
    return len(kept), round(len(kept) * 16.0 / nibble)


def test_matches_bruteforce_and_deterministic(spark, small_transcripts_pdf):
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    rep = {r["entity"]: (r["n_sampled"], r["est_distinct"])
           for r in corpus_sketch_report(idx).collect()}
    docs = idx.docs.select("conv_id", "doc_id").collect()
    terms = [r["term"] for r in idx.terms.collect()]
    pairs = [f"{r['term']}|{r['doc_id']}"
             for r in idx.postings.select("term", "doc_id").collect()]
    assert rep["conv_id"] == _brute({r["conv_id"] for r in docs}, 4)
    assert rep["doc_id"] == _brute({r["doc_id"] for r in docs}, 4)
    assert rep["term"] == _brute(terms, 4)
    assert rep["term_doc_pair"] == _brute(pairs, 4)
    # rerun = identical (no rand(), no engine state)
    rep2 = {r["entity"]: (r["n_sampled"], r["est_distinct"])
            for r in corpus_sketch_report(idx).collect()}
    assert rep == rep2


def test_estimator_accuracy_at_scale(spark):
    # 200k distinct ids at p=1/4: stderr ~ sqrt((1-p)/(p*D)) ~ 0.4%
    df = spark.range(200_000).select(F.concat(F.lit("id_"), "id").alias("v"))
    row = hash_threshold_distinct(df, F.col("v"), nibble=4).first()
    assert row["est_distinct"] == pytest.approx(200_000, rel=0.02)
    # duplicates must not inflate the estimate (distinct-of-sample)
    dup = df.unionByName(df)
    row2 = hash_threshold_distinct(dup, F.col("v"), nibble=4).first()
    assert row2["est_distinct"] == row["est_distinct"]


def test_nibble_validation(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        hash_threshold_distinct(df, F.col("v"), nibble=0).first()
    with pytest.raises(ValueError):
        hash_threshold_distinct(df, F.col("v"), nibble=17).first()
