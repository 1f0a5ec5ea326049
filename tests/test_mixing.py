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
