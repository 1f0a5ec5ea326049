"""All-pairs sparse similarity: prefix-filtered result must equal the
naive exact self-join, which must equal a numpy brute force."""

from __future__ import annotations

import numpy as np
import pytest

from fulltextsearchengine_spark.operators.apss import (
    sparse_cosine_pairs,
    tfidf_vectors,
)
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.sources.rawlog import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def idx(spark, small_transcripts_pdf):
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    index = build_index(sdf)
    index.postings = index.postings.cache()
    index.docs = index.docs.cache()
    return index


def _brute_pairs(vec_rows, threshold: float) -> set[tuple[int, int, int]]:
    """numpy brute force over the collected normalized vectors."""
    by_doc: dict[int, dict[str, float]] = {}
    for r in vec_rows:
        by_doc.setdefault(r["doc_id"], {})[r["term"]] = r["w"]
    docs = sorted(by_doc)
    out = set()
    tmicro = round(threshold * 1e6)
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            va, vb = by_doc[a], by_doc[b]
            if len(vb) < len(va):
                va, vb = vb, va
            dot = sum(w * vb[t] for t, w in va.items() if t in vb)
            micro = round(dot * 1e6)
            if micro >= tmicro:
                out.add((a, b, micro))
    return out


def test_tfidf_vectors_normalized(idx):
    rows = tfidf_vectors(idx).collect()
    norms: dict[int, float] = {}
    for r in rows:
        norms[r["doc_id"]] = norms.get(r["doc_id"], 0.0) + r["w"] ** 2
    assert norms, "no vectors produced"
    for d, n2 in norms.items():
        assert abs(n2 - 1.0) < 1e-9, (d, n2)


@pytest.mark.parametrize("threshold", [0.4, 0.7])
def test_prefix_filter_matches_exact_and_brute(idx, threshold):
    vec_rows = tfidf_vectors(idx).collect()
    brute = _brute_pairs(vec_rows, threshold)

    exact = {
        (r["doc_a"], r["doc_b"], r["cos_micro"])
        for r in sparse_cosine_pairs(idx, threshold, exact_baseline=True).collect()
    }
    filtered = {
        (r["doc_a"], r["doc_b"], r["cos_micro"])
        for r in sparse_cosine_pairs(idx, threshold).collect()
    }
    assert exact == brute
    assert filtered == brute
    assert brute, f"degenerate corpus: no pairs at threshold {threshold}"


def test_prefix_filter_prunes_candidates(idx):
    """The point of the prefix filter: the indexed posting set must be a
    strict subset of the full vector set (hot terms mostly skipped)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    vecs = tfidf_vectors(idx)
    term_meta = vecs.groupBy("term").agg(F.max("w").alias("mw"))
    with_meta = vecs.join(term_meta, "term").join(idx.terms.select("term", "df"), "term")
    w_order = Window.partitionBy("doc_id").orderBy(F.desc("df"), F.asc("term"))
    cum = F.sum(F.col("w") * F.col("mw")).over(
        w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = with_meta.select("doc_id", "term", (cum >= 0.7).alias("indexed"))
    total = flagged.count()
    indexed = flagged.filter("indexed").count()
    assert indexed < total * 0.9, (indexed, total)


def test_threshold_guard(idx):
    with pytest.raises(ValueError):
        sparse_cosine_pairs(idx, 0.0)
    with pytest.raises(ValueError):
        sparse_cosine_pairs(idx, 1.5)


def test_persist_handles_released(idx):
    # long-lived sessions can release the call's MEMORY_AND_DISK cache
    # (ADVICE r3): the two persisted frames are exposed via the out-list
    handles: list = []
    df = sparse_cosine_pairs(idx, 0.8, persist_handles=handles)
    assert len(handles) == 2
    n = df.count()
    assert n >= 0 and all(h.storageLevel.useMemory for h in handles)
    for h in handles:
        h.unpersist()
    assert all(not h.storageLevel.useMemory for h in handles)
