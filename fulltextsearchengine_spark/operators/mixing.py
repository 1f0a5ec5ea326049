"""Token-budget-driven domain mixture sampling — the step that turns a
target training mix ("books 30%, web 50%, code 20% of a 1T-token run")
into per-domain keep rates and a deterministic sample.

Composition over ``sampling.stratified_sample``: one tiny per-domain
aggregation (Σ cost over each domain — token counts, chars, whatever the
cost column is) collects to the driver, rates follow as
``rate_d = min(1, budget·w_d / cost_d)``, and the keep decision is the
same md5-threshold pure-function-of-the-row-key filter stratified
sampling uses — reproducible at any cluster size, partitioning, or
engine, and nested under rate increases (ablation curves).

Scale shape: the plan aggregation is one map-side-combining groupBy over
a handful of domains; the sample itself is a pure scan filter with zero
shuffles. Domains absent from ``weights`` keep rate 0 (curated-mix
default, as in stratified_sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import stratified_sample


def mixture_plan(
    df: DataFrame,
    domain_col: str,
    cost_col: str,
    weights: dict[str, float],
    budget: float,
) -> dict[str, tuple[int, float]]:
    """domain → (total_cost, keep_rate). Weights are normalized to sum
    1; rate_d = min(1, (budget·w_d) / total_cost_d), computed as a
    single double division so an independent SQL engine reproduces the
    rates bit-identically from the same integer costs."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    sumw = float(sum(weights.values()))
    if sumw <= 0:
        raise ValueError("weights must sum to > 0")
    rows = (
        df.filter(F.col(domain_col).isin(sorted(weights)))
        .groupBy(domain_col)
        .agg(F.sum(cost_col).alias("total_cost"))
        .collect()
    )
    totals = {r[domain_col]: int(r["total_cost"]) for r in rows}
    plan: dict[str, tuple[int, float]] = {}
    for d in sorted(weights):
        total = totals.get(d, 0)
        target = budget * (weights[d] / sumw)
        rate = 1.0 if total == 0 else min(1.0, target / total)
        plan[d] = (total, rate)
    return plan


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    cost_col: str,
    weights: dict[str, float],
    budget: float,
    key_col: str,
) -> DataFrame:
    """Deterministic sample hitting the per-domain token budgets in
    expectation: keep row iff md5(key)[:8] < threshold(rate_domain)."""
    plan = mixture_plan(df, domain_col, cost_col, weights, budget)
    rates = {d: rate for d, (_, rate) in plan.items()}
    return stratified_sample(df, domain_col, rates, key_col)
