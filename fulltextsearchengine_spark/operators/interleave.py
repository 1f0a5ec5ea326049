"""Team-draft interleaving — the online ranking-experiment primitive
(Radlinski, Kurup & Joachims, CIKM'08): merge two rankers' results into
ONE list shown to the user; clicks on each team's picks decide the
winner with far fewer impressions than an A/B split, because every
impression compares both rankers.

Deterministic variant: team A always drafts first in each round (the
coin flip in the published protocol only removes position bias ACROSS
impressions; a fixed order keeps single-impression output reproducible,
which is what a cross-engine gate needs — production would hash an
impression id into the coin). Each pick takes the team's highest-ranked
document not already selected; the draft stops at ``depth`` or when the
due team has no unselected document left.

Scale shape: interleaving operates on two TOP-K LISTS — driver-sized by
definition (the k-merge/bounded-collect contract WAND and RM3 already
use). Each arm collects a pool of 2·depth rows: a team's pointer can
skip at most the depth−1 docs the other team already took plus its own
⌈depth/2⌉ picks, so a 2·depth pool can never exhaust before a full
ordering would — making the bounded pool EXACT, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordered_ids(ranking: DataFrame, pool: int, id_col: str) -> list[int]:
    rows = (
        ranking.orderBy(F.desc("score"), F.asc(id_col)).limit(pool).collect()
    )
    return [int(r[id_col]) for r in rows]


def team_draft_interleave(
    rank_a: DataFrame,
    rank_b: DataFrame,
    depth: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """(position, doc_id, team): the interleaved list. Inputs are score
    rankings ((doc_id, score) frames — any scorer's output); order is
    (score desc, doc_id asc), the engine's total tie-break."""
    if depth <= 0:
        raise ValueError(f"depth must be positive, got {depth}")
    a = _ordered_ids(rank_a, 2 * depth, id_col)
    b = _ordered_ids(rank_b, 2 * depth, id_col)
    taken: set[int] = set()
    out: list[tuple[int, int, str]] = []
    pos_a = pos_b = 0
    team = "A"
    while len(out) < depth:
        lst, idx = (a, pos_a) if team == "A" else (b, pos_b)
        while idx < len(lst) and lst[idx] in taken:
            idx += 1
        if idx >= len(lst):
            break  # due team exhausted — draft ends
        doc = lst[idx]
        taken.add(doc)
        out.append((len(out) + 1, doc, team))
        if team == "A":
            pos_a = idx + 1
            team = "B"
        else:
            pos_b = idx + 1
            team = "A"
    spark = rank_a.sparkSession
    return spark.createDataFrame(out, "position int, doc_id long, team string")


def interleave_credit(
    interleaved: DataFrame, clicked_doc_ids: list[int]
) -> DataFrame:
    """(team, picks, clicks): per-team click credit for one impression —
    the quantity summed across impressions to call the experiment
    (team with more total clicks wins; ties are no-decision)."""
    clicks = {int(d) for d in clicked_doc_ids}
    spark = interleaved.sparkSession
    rows = interleaved.collect()
    out = []
    for team in ("A", "B"):
        picks = [r for r in rows if r["team"] == team]
        out.append((team, len(picks), sum(1 for r in picks if r["doc_id"] in clicks)))
    return spark.createDataFrame(out, "team string, picks long, clicks long")
