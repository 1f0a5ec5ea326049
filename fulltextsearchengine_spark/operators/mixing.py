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


def _domain_totals(
    df: DataFrame,
    domain_col: str,
    cost_col: str,
    restrict_to: list[str] | None,
) -> dict[str, int]:
    """domain → Σ cost as exact ints: ONE map-side-combining groupBy
    over the domain cardinality, collected driver-side. Shared by every
    planner here so each plan call scans the corpus exactly once."""
    agg = df
    if restrict_to is not None:
        agg = agg.filter(F.col(domain_col).isin(sorted(restrict_to)))
    rows = agg.groupBy(domain_col).agg(F.sum(cost_col).alias("total_cost")).collect()
    return {r[domain_col]: int(r["total_cost"]) for r in rows}


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
    totals = _domain_totals(df, domain_col, cost_col, sorted(weights))
    plan: dict[str, tuple[int, float]] = {}
    for d in sorted(weights):
        total = totals.get(d, 0)
        target = budget * (weights[d] / sumw)
        rate = 1.0 if total == 0 else min(1.0, target / total)
        plan[d] = (total, rate)
    return plan


def temperature_weights(
    df: DataFrame,
    domain_col: str,
    cost_col: str,
    tau: float,
    domains: list[str] | None = None,
) -> dict[str, float]:
    """Temperature-scaled mixture weights w_d ∝ (Σ cost_d)^τ — the
    multilingual-pretraining reweighting (mBERT/XLM-R exponential
    smoothing; τ=1 is proportional/natural, τ=0 uniform, τ∈(0,1) lifts
    the tail without letting head domains drown it.

    One map-side-combining groupBy over the domain cardinality; weights
    are computed driver-side from the integer totals with plain double
    math so any SQL engine reproduces them bit-identically.
    ``domains`` restricts/orders the universe (absent → every domain
    seen, empty-cost domains get weight 0)."""
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    totals = _domain_totals(df, domain_col, cost_col, domains)
    return _temperature_weights_from_totals(totals, tau, domains)


def _temperature_weights_from_totals(
    totals: dict[str, int],
    tau: float,
    domains: list[str] | None,
) -> dict[str, float]:
    universe = sorted(domains) if domains is not None else sorted(totals)
    powered = {d: float(totals.get(d, 0)) ** tau if totals.get(d, 0) else 0.0 for d in universe}
    z = sum(powered.values())
    if z <= 0:
        raise ValueError("no domain has positive cost")
    return {d: powered[d] / z for d in universe}


def mixture_temperature_plan(
    df: DataFrame,
    domain_col: str,
    cost_col: str,
    tau: float,
    budget: float,
    domains: list[str] | None = None,
) -> dict[str, tuple[int, float, float]]:
    """domain → (total_cost, weight, keep_rate) under temperature-τ
    weights: rate_d = min(1, budget·w_d / total_cost_d). Composes
    ``temperature_weights`` with the ``mixture_plan`` rate rule."""
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    # ONE corpus scan: the same integer totals feed both the weights and
    # the rates. Rates come DIRECTLY from the already-normalized w_d —
    # routing through mixture_plan would re-normalize by sum(w)≈1.0, an
    # extra float division whose rounding can flip a rate landing
    # exactly on a .5 micro-rounding boundary vs the oracle's single
    # p/z division (advice r4).
    totals = _domain_totals(df, domain_col, cost_col, domains)
    w = _temperature_weights_from_totals(totals, tau, domains)
    out: dict[str, tuple[int, float, float]] = {}
    for d in w:
        total = totals.get(d, 0)
        rate = 1.0 if total == 0 else min(1.0, budget * w[d] / total)
        out[d] = (total, w[d], rate)
    return out


def mixture_temperature_sample(
    df: DataFrame,
    domain_col: str,
    cost_col: str,
    tau: float,
    budget: float,
    key_col: str,
    domains: list[str] | None = None,
) -> DataFrame:
    """Deterministic md5-threshold sample hitting the temperature-τ
    per-domain budgets in expectation (same keep rule as
    ``mixture_sample``; nested under budget increases)."""
    plan = mixture_temperature_plan(df, domain_col, cost_col, tau, budget, domains)
    rates = {d: rate for d, (_, _, rate) in plan.items()}
    return stratified_sample(df, domain_col, rates, key_col)


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
