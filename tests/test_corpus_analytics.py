"""Corpus analytics: significant terms, power-law fits, sessionization,
and query clarity vs pure-python brute-force recomputations."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fulltextsearchengine_spark.operators.feedback import query_clarity
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.keywords import significant_terms
from fulltextsearchengine_spark.operators.report import corpus_law_report
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.operators.sessions import session_stats, sessionize
from fulltextsearchengine_spark.sources.rawlog import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def searcher(spark, small_transcripts_pdf):
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    idx.postings = idx.postings.cache()
    idx.docs = idx.docs.cache()
    return Searcher(idx)


# --- significant terms ------------------------------------------------------


def test_significant_terms_matches_brute(searcher):
    idx = searcher.index
    role_of = {r["doc_id"]: r["role"] for r in idx.docs.select("doc_id", "role").collect()}
    fg_ids = {d for d, role in role_of.items() if role == "user"}
    n_docs = len(role_of)
    df_of, fg_df = {}, {}
    for r in idx.postings.select("term", "doc_id").collect():
        df_of[r["term"]] = df_of.get(r["term"], 0) + 1
        if r["doc_id"] in fg_ids:
            fg_df[r["term"]] = fg_df.get(r["term"], 0) + 1
    brute = []
    for t, f in fg_df.items():
        if f < 2:
            continue
        fgp, bgp = f / len(fg_ids), df_of[t] / n_docs
        brute.append((int(round((fgp - bgp) * (fgp / bgp) * 1e6)), t, f, df_of[t]))
    brute.sort(key=lambda x: (-x[0], x[1]))
    expected = [(t, f, d, j) for j, t, f, d in brute[:10]]

    got = [
        (r["term"], r["fg_df"], r["df"], r["jlh_micro"])
        for r in significant_terms(idx, F.col("role") == "user", k=10).collect()
    ]
    assert got == expected


def test_significant_terms_empty_foreground_raises(searcher):
    with pytest.raises(ValueError):
        significant_terms(searcher.index, F.col("role") == "nosuchrole")


# --- corpus power laws ------------------------------------------------------


def _ols(x, y):
    x, y = np.asarray(x), np.asarray(y)
    n = len(x)
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / (n * (x * x).sum() - x.sum() ** 2)
    return slope, (y.sum() - slope * x.sum()) / n


def test_corpus_law_report_matches_brute(searcher):
    idx = searcher.index
    top_r, pts = 60, 6
    cfs = sorted(
        ((r["cf"], r["term"]) for r in idx.terms.collect()),
        key=lambda x: (-x[0], x[1]),
    )[:top_r]
    zs, zi = _ols(
        [math.log(r + 1) for r in range(len(cfs))], [math.log(c) for c, _ in cfs]
    )

    doc_len = {r["doc_id"]: r["doc_len"] for r in idx.docs.select("doc_id", "doc_len").collect()}
    first = {}
    for r in idx.postings.select("term", "doc_id").collect():
        first[r["term"]] = min(first.get(r["term"], 1 << 60), r["doc_id"])
    n_docs = len(doc_len)
    cuts = [max(1, (n_docs * i) // pts) for i in range(1, pts + 1)]
    ns = [sum(l for d, l in doc_len.items() if d <= c) for c in cuts]
    vs = [sum(1 for f in first.values() if f <= c) for c in cuts]
    hb, hk = _ols([math.log(n) for n in ns], [math.log(v) for v in vs])

    row = corpus_law_report(idx, top_r=top_r, heaps_points=pts).collect()[0]
    assert row["zipf_slope_micro"] == int(round(zs * 1e6))
    assert row["zipf_intercept_micro"] == int(round(zi * 1e6))
    assert row["heaps_beta_micro"] == int(round(hb * 1e6))
    assert row["heaps_logk_micro"] == int(round(hk * 1e6))
    # natural-ish corpus sanity: zipf slope negative, 0 < beta <= 1
    assert row["zipf_slope_micro"] < 0
    assert 0 < row["heaps_beta_micro"] <= 1_000_000


def test_corpus_law_too_few_docs_raises(spark):
    pdf = __import__(
        "fulltextsearchengine_spark.datagen", fromlist=["make_transcripts"]
    ).make_transcripts(n_turns=4, n_convs=2, vocab_size=20, seed=1)
    idx = build_index(spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA))
    with pytest.raises(ValueError):
        corpus_law_report(idx, heaps_points=8)


# --- sessionization ---------------------------------------------------------


def _events(spark):
    base = dt.datetime(2026, 3, 1)
    rows = [
        # user 0: 3 events in one session, then a >gap break, then 1
        (1, base, 0, "a", 1.0, None),
        (2, base + dt.timedelta(seconds=100), 0, "b", 2.0, None),
        (3, base + dt.timedelta(seconds=200), 0, "a", 3.0, None),
        (4, base + dt.timedelta(seconds=200 + 601), 0, "a", 4.0, None),
        # user 1: gap EXACTLY equal to threshold → same session
        (5, base, 1, "a", 1.5, None),
        (6, base + dt.timedelta(seconds=600), 1, "b", 2.5, None),
        # user 2: timestamp tie — order falls back to event_id
        (8, base, 2, "b", 1.0, None),
        (7, base, 2, "a", 1.0, None),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_sessionize_matches_brute(spark):
    got = {
        (r["event_id"]): (r["user_id"], r["session_idx"])
        for r in sessionize(_events(spark), gap_seconds=600).collect()
    }
    assert got == {
        1: (0, 1), 2: (0, 1), 3: (0, 1), 4: (0, 2),
        5: (1, 1), 6: (1, 1),  # boundary gap does NOT split
        7: (2, 1), 8: (2, 1),
    }


def test_sessionize_split_stitches_boundaries(spark):
    """Crafted boundary cases for the (user, bucket) pre-split: sessions
    spanning bucket edges must merge, sessions ending at an edge must
    not."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 0: session crosses a 3600s bucket edge (gap 100 <= 600)
        (1, base + dt.timedelta(seconds=3550), 0, "a", 1.0, None),
        (2, base + dt.timedelta(seconds=3650), 0, "a", 1.0, None),
        # ...and a separate later session in bucket 2
        (3, base + dt.timedelta(seconds=8000), 0, "a", 1.0, None),
        # user 1: two sessions entirely inside one bucket, then a
        # continuing one across the edge — offsets must accumulate
        (4, base + dt.timedelta(seconds=100), 1, "a", 1.0, None),
        (5, base + dt.timedelta(seconds=1000), 1, "a", 1.0, None),
        (6, base + dt.timedelta(seconds=3599), 1, "a", 1.0, None),
        (7, base + dt.timedelta(seconds=3700), 1, "a", 1.0, None),
        # user 2: empty middle bucket — gap spans 2 buckets but <= gap_s
        # is impossible here; use gap > threshold → new session
        (8, base, 2, "a", 1.0, None),
        (9, base + dt.timedelta(seconds=7300), 2, "a", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    plain = sessionize(df, gap_seconds=600)
    split = sessionize(df, gap_seconds=600, split_bucket_seconds=3600.0)
    key = lambda r: (r["event_id"], r["user_id"], r["session_idx"], r["is_session_start"])
    assert sorted(map(key, plain.collect())) == sorted(map(key, split.collect()))
    got = {r["event_id"]: r["session_idx"] for r in split.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 2, 6: 3, 7: 3, 8: 1, 9: 2}


def test_sessionize_split_hot_key_parity(spark):
    """Verdict r4 #5 family: a hot key with 10^5 events — split path is
    value-identical to the unsplit window."""
    import numpy as np

    rng = np.random.RandomState(11)
    n_hot, n_cold = 100_000, 20_000
    base = 1_700_000_000
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n_hot + n_cold),
            "user_id": np.concatenate(
                [np.zeros(n_hot, dtype=np.int64), rng.randint(1, 40, n_cold)]
            ),
            "eps": base + rng.randint(0, 10 * 86400, n_hot + n_cold),
        }
    )
    df = (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.timestamp_seconds("eps"))
        .drop("eps")
    )
    plain = sessionize(df, gap_seconds=120.0)
    split = sessionize(df, gap_seconds=120.0, split_bucket_seconds=3600.0)
    assert split.exceptAll(plain).count() == 0
    assert plain.exceptAll(split).count() == 0
    with pytest.raises(ValueError):
        sessionize(df, gap_seconds=120.0, split_bucket_seconds=0.0)


def test_sessionize_split_null_user_and_ts_identity(spark):
    """r5 review: Window.partitionBy groups NULL users (and NULL-ts
    rows) like any key, so the split path's stitch join must be
    null-safe — a plain equi-join silently DROPPED those rows."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, None, "a", 1.0, None),
        (2, base + dt.timedelta(seconds=50), None, "a", 1.0, None),
        (3, base + dt.timedelta(seconds=4000), None, "a", 1.0, None),
        (4, None, None, "a", 1.0, None),  # NULL user AND NULL ts
        (5, None, 7, "a", 1.0, None),     # NULL ts, real user
        (6, base + dt.timedelta(seconds=10), 7, "a", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    plain = sessionize(df, gap_seconds=600)
    split = sessionize(df, gap_seconds=600, split_bucket_seconds=3600.0)
    assert plain.count() == len(rows)
    assert split.count() == len(rows)  # no silent row loss
    assert split.exceptAll(plain).count() == 0
    assert plain.exceptAll(split).count() == 0


def test_session_stats(spark):
    rows = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(_events(spark), gap_seconds=600).collect()
    }
    s01 = rows[(0, 1)]
    assert s01["n_events"] == 3
    assert s01["duration_sec"] == 200
    assert s01["n_event_types"] == 2
    assert s01["sum_value_micro"] == 6_000_000
    assert rows[(0, 2)]["n_events"] == 1
    assert rows[(1, 1)]["duration_sec"] == 600
    assert rows[(2, 1)]["n_events"] == 2


# --- query clarity ----------------------------------------------------------


def test_query_clarity_matches_brute(searcher):
    hot = [r["term"] for r in searcher.index.terms.orderBy(F.desc("df"), F.asc("term")).limit(4).collect()]
    queries = {"q0": hot[:2], "q1": hot[2:], "q_oov": ["zzzznotaterm"]}
    fb = 5
    stats = searcher.stats
    postings = searcher.index.postings.select("term", "doc_id", "tf", "doc_len").collect()
    by_doc: dict[int, list] = {}
    for r in postings:
        by_doc.setdefault(r["doc_id"], []).append(r)
    cf = {r["term"]: r["cf"] for r in searcher.index.terms.collect()}

    expected = {}
    for qid, q in queries.items():
        hits = searcher.bm25_search(q, fb).collect()
        total = sum(r["score"] for r in hits)
        p_d = {r["doc_id"]: r["score"] / total for r in hits} if total > 0 else {}
        p_r: dict[str, float] = {}
        rows = [row for d in sorted(p_d) for row in by_doc.get(d, [])]
        for row in sorted(rows, key=lambda r: (r["term"], r["doc_id"])):
            p_r[row["term"]] = p_r.get(row["term"], 0.0) + p_d[row["doc_id"]] * (
                row["tf"] / row["doc_len"]
            )
        clarity = sum(
            p * math.log2(p / (cf[t] / stats["total_tokens"]))
            for t, p in sorted(p_r.items())
            if p > 0
        )
        expected[qid] = (int(round(clarity * 1e6)), len(hits))

    got = {
        r["query_id"]: (r["clarity_micro"], r["n_fb"])
        for r in query_clarity(searcher, queries, fb_docs=fb).collect()
    }
    assert got == expected
    assert got["q_oov"] == (0, 0)
    # focused queries should be clearer than background: positive KL
    assert got["q0"][0] > 0 and got["q1"][0] > 0
