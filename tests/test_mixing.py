"""Mixture sampling vs brute-force python recomputation."""

from __future__ import annotations

import hashlib

import pytest

from fulltextsearchengine_spark.operators.mixing import mixture_plan, mixture_sample
from fulltextsearchengine_spark.operators.sampling import rate_threshold


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"src{i % 4}", 100 + (i * 37) % 500)  # skewed costs per domain
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, cost long"), rows


def test_mixture_plan_rates(docs):
    sdf, rows = docs
    weights = {"src0": 2.0, "src1": 1.0, "src3": 1.0}  # src2 unweighted
    budget = 30_000.0
    plan = mixture_plan(sdf, "source", "cost", weights, budget)
    assert set(plan) == set(weights)
    for d, (total, rate) in plan.items():
        exp_total = sum(c for _, s, c in rows if s == d)
        assert total == exp_total
        target = budget * (weights[d] / 4.0)
        assert rate == min(1.0, target / exp_total)


def test_mixture_sample_matches_bruteforce(docs):
    sdf, rows = docs
    weights = {"src0": 2.0, "src1": 1.0, "src3": 1.0}
    budget = 30_000.0
    plan = mixture_plan(sdf, "source", "cost", weights, budget)
    got = {r["doc_id"] for r in mixture_sample(sdf, "source", "cost", weights, budget, "doc_id").collect()}
    exp = set()
    for doc_id, s, _ in rows:
        if s not in plan:
            continue  # unweighted domain dropped
        thr = rate_threshold(plan[s][1])
        if hashlib.md5(str(doc_id).encode()).hexdigest()[:8] < thr:
            exp.add(doc_id)
    assert got == exp
    assert not {r["doc_id"] for r in sdf.filter("source = 'src2'").collect()} & got


def test_mixture_budget_hit_in_expectation(docs):
    sdf, rows = docs
    # generous budget -> rate 1.0 everywhere -> whole weighted domains kept
    weights = {"src0": 1.0, "src1": 1.0}
    plan = mixture_plan(sdf, "source", "cost", weights, 10**9)
    assert all(rate == 1.0 for _, rate in plan.values())
    kept = mixture_sample(sdf, "source", "cost", weights, 10**9, "doc_id").count()
    assert kept == sum(1 for _, s, _ in rows if s in weights)


def test_mixture_guards(docs):
    sdf, _ = docs
    with pytest.raises(ValueError):
        mixture_plan(sdf, "source", "cost", {}, 100.0)
    with pytest.raises(ValueError):
        mixture_plan(sdf, "source", "cost", {"src0": -1.0}, 100.0)


def test_hash_split_deterministic_and_stable(spark):
    import hashlib

    from fulltextsearchengine_spark.operators.sampling import hash_split

    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    got = {r["doc_id"]: r["split"] for r in hash_split(docs, fr, seed=7).collect()}

    def py_split(i):
        u = int(hashlib.md5(f"7:{i}".encode()).hexdigest()[:13], 16) / 2**52
        if u < 0.8:
            return "train"
        if u < 0.9:
            return "valid"
        return "test"

    assert got == {i: py_split(i) for i in range(2000)}
    from collections import Counter

    c = Counter(got.values())
    assert 0.75 < c["train"] / 2000 < 0.85  # fractions roughly honored
    # stability under corpus growth: doc keeps its split in a superset
    bigger = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    got2 = {r["doc_id"]: r["split"] for r in hash_split(bigger, fr, seed=7).collect()}
    assert all(got2[i] == s for i, s in got.items())
    import pytest as _pt

    with _pt.raises(ValueError):
        hash_split(docs, {"a": 0.5, "b": 0.4})
