"""Heavy-hitter terms via a mergeable Misra-Gries sketch + an exact
refinement pass — "every term carrying ≥ φ of the corpus's tokens",
answered EXACTLY, with the shuffle bounded by the sketch size instead
of the vocabulary.

Why not just groupBy(term)? That shuffles the whole vocabulary to find
a handful of rows. The classic two-phase shape (Misra-Gries 1982;
mergeable-summaries form per Agarwal, Cormode et al., PODS 2012):

  phase 1 (candidates, zero shuffle): each partition streams its
    (term, tf) rows through a k-counter weighted Misra-Gries summary
    inside ``mapInPandas`` — per Arrow batch a vectorized
    groupby-sum merges into the summary, then one truncation subtracts
    the (k+1)-th largest count and drops the non-positive (the
    mergeable-summaries merge; a vocab-sized dict update per batch,
    never a per-row loop). Survivors: ≤ k terms per partition.
    Guarantee: a term with global weight ≥ N/(k+1) has, by pigeonhole,
    ≥ W_p/(k+1) of some partition's weight W_p, and a weighted MG
    summary never evicts such a term — so the union of per-partition
    survivors is a SUPERSET of every φ-heavy term when φ ≥ 1/(k+1).

  phase 2 (exact, sketch-bounded shuffle): broadcast the candidate set
    (≤ partitions·k terms), semi-join the postings, and aggregate the
    exact cf of candidates only. False positives fall to the final
    ``cf >= φ·N`` filter; false negatives cannot exist (the guarantee),
    so the output is exactly ``{term : cf(term) >= φ·N}`` — which is
    why this op is oracle-twinnable against a plain SQL HAVING.

At 100 TB: phase 1 is a pure scan; the only shuffle aggregates
|partitions|·k rows. N comes from the index's stats table (no second
corpus scan).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index_build import InvertedIndex


def _mg_partition(k: int):
    """Weighted Misra-Gries over Arrow batches of (term, tf); yields
    the ≤ k surviving terms of this partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            summed = pdf.groupby("term", sort=False)["tf"].sum()
            for term, w in summed.items():  # vocab-of-batch-sized, not row-sized
                counts[term] = counts.get(term, 0) + int(w)
            if len(counts) > k:
                vals = sorted(counts.values(), reverse=True)
                dec = vals[k]  # (k+1)-th largest
                counts = {t: c - dec for t, c in counts.items() if c - dec > 0}
        yield pd.DataFrame({"term": pd.Series(list(counts.keys()), dtype=object)})

    return run


def term_heavy_hitters(
    index: InvertedIndex,
    phi: float,
    sketch_counters: int | None = None,
) -> DataFrame:
    """(term, cf, share_ppm) for every term with cf ≥ φ·total_tokens,
    exact counts, descending cf (ties by term).

    ``sketch_counters`` defaults to the smallest k honoring the no-miss
    guarantee (k ≥ 1/φ); passing a smaller k raises rather than
    silently returning a lossy result."""
    if not 0.0 < phi <= 1.0:
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    k_min = math.ceil(1.0 / phi)
    if sketch_counters is None:
        sketch_counters = k_min
    elif sketch_counters < k_min:
        raise ValueError(
            f"sketch_counters={sketch_counters} cannot guarantee phi={phi}; "
            f"need >= ceil(1/phi) = {k_min}"
        )

    src = index.postings.select("term", F.col("tf").cast("long").alias("tf"))
    cand = (
        src.mapInPandas(_mg_partition(sketch_counters), schema="term string")
        .distinct()
    )
    total = int(index.stats_row()["total_tokens"])
    thresh = phi * float(total)
    return (
        src.join(F.broadcast(cand), "term")
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"))
        .filter(F.col("cf") >= F.lit(thresh))
        .select(
            "term",
            "cf",
            F.round(F.col("cf") / F.lit(float(total)) * 1e6).cast("long").alias("share_ppm"),
        )
        .orderBy(F.desc("cf"), F.asc("term"))
    )
