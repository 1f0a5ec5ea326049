"""Tiled bench-corpus generation (bench.ensure_bench_corpus).

Corpora above the bulk base size are tiled from the cached base with
conv_id remapped per replica — row counts must scale exactly, replica
conv universes must be disjoint, and per-replica text content must be
identical (same workload shape, more of it).
"""

import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def small_base(monkeypatch, tmp_path):
    import bench

    monkeypatch.setattr(bench, "BULK_BASE_TURNS", 2000)
    return bench, tmp_path


def test_tiled_corpus_scales_exactly(small_base):
    bench, tmp_path = small_base
    base = bench.ensure_bench_corpus(2000, tmp_path)
    tiled = bench.ensure_bench_corpus(6000, tmp_path)

    tb = pq.read_table(base)
    tt = pq.read_table(tiled)
    assert tt.num_rows == 3 * tb.num_rows

    convs = tt["conv_id"].to_pylist()
    prefixes = {c.split("_", 1)[0] for c in convs}
    assert prefixes == {"r0", "r1", "r2"}

    # each replica's conv universe is the base's, prefixed — disjoint
    # across replicas, identical within
    base_convs = set(tb["conv_id"].to_pylist())
    for rep in ("r0", "r1", "r2"):
        rep_convs = {c.split("_", 1)[1] for c in convs if c.startswith(rep + "_")}
        assert rep_convs == base_convs

    # text multiset triples: same docs, three times
    from collections import Counter

    assert Counter(tt["text"].to_pylist()) == {
        t: 3 * n for t, n in Counter(tb["text"].to_pylist()).items()
    }


def test_non_multiple_falls_back_to_generation(small_base):
    bench, tmp_path = small_base
    p = bench.ensure_bench_corpus(2500, tmp_path)  # not a multiple of base
    assert pq.read_table(p).num_rows == 2500
