"""Session-6 operators: as-of join, funnel, range join, heavy hitters,
temperature mixture. Each checked against a brute-force pandas/python
oracle on crafted inputs (the driver gate re-checks against DuckDB at
sf0.01)."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- asof


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:10:00"), 5.0),
            (2, 10, _ts("2024-01-01 00:20:00"), 6.0),
            (3, 10, _ts("2024-01-01 00:04:00"), 7.0),  # before any right
            (4, 20, _ts("2024-01-01 01:00:00"), 8.0),
            (5, 20, _ts("2024-01-01 00:30:00"), 9.0),  # tie with right ts
            (6, 30, _ts("2024-01-01 00:00:00"), 1.0),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:05:00"), "a"),
            (101, 10, _ts("2024-01-01 00:15:00"), "b"),
            (102, 20, _ts("2024-01-01 00:30:00"), "c"),  # equal-ts: matches left 5
            (103, 20, _ts("2024-01-01 00:30:00"), "d"),  # same ts, higher id wins
        ],
        "ref_id long, user_id long, ts timestamp, tag string",
    )
    return left, right


def test_asof_backward_inclusive_and_ties(spark, asof_frames):
    from fulltextsearchengine_spark.operators.asof import asof_join

    left, right = asof_frames
    out = asof_join(left, right, on="user_id", right_cols=["ref_id", "tag"], right_id="ref_id")
    got = {r["event_id"]: (r["ref_id_r"], r["tag_r"]) for r in out.collect()}
    assert got[1] == (100, "a")  # 00:05 latest at-or-before 00:10
    assert got[2] == (101, "b")
    assert got[3] == (None, None)  # nothing at-or-before
    assert got[4] == (103, "d")
    assert got[5] == (103, "d")  # equal ts matches; max ref_id breaks the tie
    assert got[6] == (None, None)  # key absent from right
    assert out.count() == left.count()  # left-outer: no row gained or lost


def test_asof_lag_and_tolerance(spark, asof_frames):
    from fulltextsearchengine_spark.operators.asof import asof_join

    left, right = asof_frames
    out = asof_join(left, right, on="user_id", right_cols=["ref_id"], right_id="ref_id")
    lags = {r["event_id"]: r["asof_lag_sec"] for r in out.collect()}
    assert lags[1] == 300.0 and lags[5] == 0.0 and lags[3] is None

    tight = asof_join(
        left, right, on="user_id", right_cols=["ref_id"], right_id="ref_id",
        tolerance_seconds=299.0,
    )
    got = {r["event_id"]: r["ref_id_r"] for r in tight.collect()}
    assert got[1] is None and got[2] is None  # both lags are 300 s > 299 s
    assert got[5] == 103  # lag 0 survives any tolerance


def test_asof_matches_pandas_merge_asof(spark, sf001_events):
    """Random-ish real data: purchases joined to latest prior signup,
    compared row-for-row with pandas.merge_asof."""
    from fulltextsearchengine_spark.operators.asof import asof_join

    ev = sf001_events
    left = ev.filter(F.col("event_type") == "purchase")
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("ref_id")
    )
    out = asof_join(left, right, on="user_id", right_cols=["ref_id"], right_id="ref_id")
    got = (
        out.select("event_id", "ref_id_r").toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    lp = left.select("event_id", "user_id", "ts").toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert (got["ref_id_r"].fillna(-1) == exp["ref_id"].fillna(-1)).all()


def test_asof_validates(spark, asof_frames):
    from fulltextsearchengine_spark.operators.asof import asof_join

    left, right = asof_frames
    with pytest.raises(ValueError):
        asof_join(left, right.select("user_id"), on="user_id")
    with pytest.raises(ValueError):
        asof_join(left, right, on="user_id", right_cols=["tag"], right_id="nope")
    with pytest.raises(ValueError):
        asof_join(left, right, on="user_id", tolerance_seconds=-1.0)
    with pytest.raises(ValueError):
        asof_join(left, right, on="user_id", split_bucket_seconds=0.0)
    with pytest.raises(ValueError, match="internals"):
        asof_join(left.withColumn("_am", F.lit(1)), right, on="user_id")


def test_asof_bigint_tie_break_exact(spark):
    """ADVICE r4: long ids > 2^53 must keep exact integer tie-breaks —
    a double cast would make 2^60 and 2^60+1 compare equal."""
    from fulltextsearchengine_spark.operators.asof import asof_join

    big = 1 << 60
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:30:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (big + 1, 10, _ts("2024-01-01 00:30:00"), "hi"),
            (big, 10, _ts("2024-01-01 00:30:00"), "lo"),
        ],
        "ref_id long, user_id long, ts timestamp, tag string",
    )
    out = asof_join(
        left, right, on="user_id", right_cols=["ref_id", "tag"], right_id="ref_id"
    ).collect()
    assert out[0]["ref_id_r"] == big + 1 and out[0]["tag_r"] == "hi"


@pytest.mark.parametrize(
    "direction,n_hot", [("backward", 1_000_000), ("forward", 100_000)]
)
def test_asof_hot_key_presplit_value_identical(spark, direction, n_hot):
    """Verdict r4 #5: one Zipf-hot key (~10^6 events) among normal keys —
    the (key, coarse-time-bucket) pre-split with boundary stitch must be
    value-identical to the unsplit window path. (Forward direction runs
    at 100k to bound suite time; the plan is direction-symmetric.)"""
    import numpy as np

    from fulltextsearchengine_spark.operators.asof import asof_join

    rng = np.random.RandomState(7)
    n_cold_keys, n_cold = 50, 20_000
    base = 1_700_000_000
    lt = pd.DataFrame(
        {
            "event_id": np.arange(n_hot + n_cold),
            "user_id": np.concatenate(
                [np.zeros(n_hot, dtype=np.int64),
                 rng.randint(1, n_cold_keys + 1, n_cold)]
            ),
            "eps": base + rng.randint(0, 30 * 86400, n_hot + n_cold),
        }
    )
    n_right = 40_000
    rt = pd.DataFrame(
        {
            "ref_id": np.arange(n_right),
            "user_id": np.concatenate(
                [np.zeros(n_right // 2, dtype=np.int64),
                 rng.randint(1, n_cold_keys + 1, n_right - n_right // 2)]
            ),
            "eps": base + rng.randint(0, 30 * 86400, n_right),
        }
    )
    left = spark.createDataFrame(lt).withColumn(
        "ts", F.timestamp_seconds("eps")
    ).drop("eps")
    right = spark.createDataFrame(rt).withColumn(
        "ts", F.timestamp_seconds("eps")
    ).drop("eps")

    kw = dict(
        on="user_id", right_cols=["ref_id"], right_id="ref_id",
        direction=direction, tolerance_seconds=7 * 86400.0,
    )
    plain = asof_join(left, right, **kw)
    split = asof_join(left, right, split_bucket_seconds=86400.0, **kw)
    assert split.exceptAll(plain).count() == 0
    assert plain.exceptAll(split).count() == 0


# -------------------------------------------------------------- funnel


def test_funnel_cascade_order(spark):
    from fulltextsearchengine_spark.operators.funnel import funnel_report

    rows = [
        # u1 completes in order
        (1, 1, _ts("2024-01-01 00:00:00"), "view"),
        (2, 1, _ts("2024-01-01 00:01:00"), "click"),
        (3, 1, _ts("2024-01-01 00:02:00"), "purchase"),
        # u2: purchase BEFORE click -> only 2 steps
        (4, 2, _ts("2024-01-01 00:00:00"), "view"),
        (5, 2, _ts("2024-01-01 00:00:30"), "purchase"),
        (6, 2, _ts("2024-01-01 00:01:00"), "click"),
        # u3: click only -> 0 steps (no view)
        (7, 3, _ts("2024-01-01 00:00:00"), "click"),
        # u4: view at same ts as click -> >= counts both
        (8, 4, _ts("2024-01-01 00:00:00"), "click"),
        (9, 4, _ts("2024-01-01 00:00:00"), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = funnel_report(ev, ["view", "click", "purchase"])
    got = {r["user_id"]: r["steps_completed"] for r in out.collect()}
    assert got == {1: 3, 2: 2, 3: 0, 4: 2}
    t = {r["user_id"]: (r["t1_micro"], r["t2_micro"], r["t3_micro"]) for r in out.collect()}
    assert t[3] == (None, None, None)
    assert t[2][2] is None  # purchase-before-click rejected
    assert t[4][0] == t[4][1]  # equal-ts view enables the click


def test_funnel_earliest_proof(spark):
    """Greedy-earliest: t_i is the FIRST qualifying event of step i."""
    from fulltextsearchengine_spark.operators.funnel import funnel_report

    ev = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 00:00:00"), "view"),
            (2, 1, _ts("2024-01-01 00:05:00"), "click"),
            (3, 1, _ts("2024-01-01 00:09:00"), "click"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    row = funnel_report(ev, ["view", "click"]).collect()[0]
    assert row["t2_micro"] == int(_ts("2024-01-01 00:05:00").timestamp() * 1e6)


def test_funnel_brute_force_parity(spark, sf001_events):
    from fulltextsearchengine_spark.operators.funnel import funnel_report

    steps = ["view", "click", "purchase"]
    out = funnel_report(sf001_events, steps)
    got = {r["user_id"]: r["steps_completed"] for r in out.collect()}
    pdf = sf001_events.select("user_id", "ts", "event_type").toPandas()
    for uid, grp in pdf.groupby("user_id"):
        prev, done = None, 0
        for s in steps:
            cand = grp[(grp.event_type == s)]
            if prev is not None:
                cand = cand[cand.ts >= prev]
            if cand.empty:
                break
            prev = cand.ts.min()
            done += 1
        assert got[uid] == done, uid


def test_funnel_validates(spark, sf001_events):
    from fulltextsearchengine_spark.operators.funnel import funnel_report

    with pytest.raises(ValueError):
        funnel_report(sf001_events, [])
    with pytest.raises(ValueError):
        funnel_report(sf001_events, ["view", "view"])
    with pytest.raises(ValueError):
        funnel_report(sf001_events, ["view"], split_bucket_seconds=-1.0)


def test_funnel_split_bucket_edges(spark):
    """Crafted stitch cases: a step resolving in a later bucket, a step
    type present too early (before its predecessor), equal-ts events."""
    rows = [
        # u1: view in bucket 0, click in bucket 1, buy in bucket 3 — all 3
        (1, "view", _ts("2024-01-01 00:10:00")),
        (1, "click", _ts("2024-01-01 01:10:00")),
        (1, "buy", _ts("2024-01-01 03:10:00")),
        # u2: click BEFORE view (earlier bucket) — click must not count;
        # a later click (same bucket as nothing else) completes step 2
        (2, "click", _ts("2024-01-01 00:05:00")),
        (2, "view", _ts("2024-01-01 01:05:00")),
        (2, "click", _ts("2024-01-01 02:05:00")),
        # u3: view and click at the SAME timestamp (>= counts both)
        (3, "view", _ts("2024-01-01 00:30:00")),
        (3, "click", _ts("2024-01-01 00:30:00")),
        # u4: only non-step events → steps_completed 0
        (4, "scroll", _ts("2024-01-01 00:01:00")),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    from fulltextsearchengine_spark.operators.funnel import funnel_report

    kw = dict(steps=["view", "click", "buy"])
    plain = funnel_report(df, **kw)
    split = funnel_report(df, split_bucket_seconds=3600.0, **kw)
    key = lambda r: tuple(r[c] for c in plain.columns)
    assert sorted(map(key, plain.collect())) == sorted(map(key, split.collect()))
    got = {r["user_id"]: r["steps_completed"] for r in split.collect()}
    assert got == {1: 3, 2: 2, 3: 2, 4: 0}


def test_funnel_split_hot_key_parity(spark, sf001_events):
    """Value identity on the sf0.001 events table plus a 10^5-event hot
    user appended — verdict r4 #5 family."""
    import numpy as np

    from fulltextsearchengine_spark.operators.funnel import funnel_report

    rng = np.random.RandomState(3)
    n = 100_000
    hot = pd.DataFrame(
        {
            "event_id": 10_000_000 + np.arange(n),
            "ts": pd.to_datetime(
                1_700_000_000 + rng.randint(0, 5 * 86400, n), unit="s"
            ),
            "user_id": 999_999,
            "event_type": rng.choice(
                ["view", "click", "purchase", "scroll"], n
            ),
            "value": 1.0,
            "props": None,
        }
    )
    df = sf001_events.unionByName(
        spark.createDataFrame(hot, schema=sf001_events.schema),
        allowMissingColumns=True,
    )
    kw = dict(steps=["view", "click", "purchase"])
    plain = funnel_report(df, **kw)
    split = funnel_report(df, split_bucket_seconds=3600.0, **kw)
    assert split.exceptAll(plain).count() == 0
    assert plain.exceptAll(split).count() == 0


# ----------------------------------------------------------- rangejoin


def test_range_join_containment(spark):
    from fulltextsearchengine_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:05:00")),
            (2, 10, _ts("2024-01-01 00:59:00")),  # outside
            (3, 10, _ts("2024-01-01 00:30:00")),  # boundary end, closed
            (4, 20, _ts("2024-01-01 00:05:00")),  # other key
        ],
        "event_id long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (10, 7, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:30:00")),
            (20, 8, _ts("2024-01-01 00:04:00"), _ts("2024-01-01 00:06:00")),
        ],
        "user_id long, session_idx long, start_ts timestamp, end_ts timestamp",
    )
    out = range_join(pts, iv, "ts", "start_ts", "end_ts", bucket_seconds=60.0, keys=["user_id"])
    got = sorted((r["event_id"], r["session_idx"]) for r in out.collect())
    assert got == [(1, 7), (3, 7), (4, 8)]

    left = range_join(pts, iv, "ts", "start_ts", "end_ts", 60.0, keys=["user_id"], how="left")
    assert left.count() == 4
    assert {r["event_id"]: r["session_idx"] for r in left.collect()}[2] is None


def test_range_join_multi_match_and_bucket_width_invariance(spark):
    from fulltextsearchengine_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:10:00"))], "event_id long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")),
            (2, _ts("2024-01-01 00:09:00"), _ts("2024-01-01 00:11:00")),
        ],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    for bw in (7.0, 60.0, 3600.0, 86400.0):
        out = range_join(pts, iv, "ts", "start_ts", "end_ts", bw)
        assert sorted(r["iv_id"] for r in out.collect()) == [1, 2], bw


def test_range_join_brute_force_parity(spark, sf001_events):
    """Purchases inside the user's click-sessions vs a plain
    inequality-join oracle."""
    from fulltextsearchengine_spark.operators.rangejoin import range_join
    from fulltextsearchengine_spark.operators.sessions import session_stats

    sess = session_stats(sf001_events, gap_seconds=7 * 86400.0).select(
        "user_id", "session_idx", "start_ts", "end_ts"
    )
    pur = sf001_events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = range_join(pur, sess, "ts", "start_ts", "end_ts", 86400.0, keys=["user_id"])
    got = sorted((r["event_id"], r["session_idx"]) for r in out.collect())
    oracle = sorted(
        (r["event_id"], r["session_idx"])
        for r in pur.alias("p")
        .join(sess.alias("s"), "user_id")
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts")))
        .collect()
    )
    assert got == oracle and len(got) > 0


def test_range_join_validates(spark, sf001_events):
    from fulltextsearchengine_spark.operators.rangejoin import range_join

    with pytest.raises(ValueError):
        range_join(sf001_events, sf001_events, "ts", "ts", "ts", 0.0)
    with pytest.raises(ValueError):
        range_join(sf001_events, sf001_events, "ts", "ts", "ts", 1.0, how="full")
    with pytest.raises(ValueError, match="internals"):
        range_join(
            sf001_events.select("event_id", "user_id", "ts").withColumn(
                "_bucket", F.lit(1)
            ),
            sf001_events.select("user_id", "start_ts", "end_ts")
            if "start_ts" in sf001_events.columns
            else sf001_events.selectExpr(
                "user_id", "ts AS start_ts", "ts AS end_ts"
            ),
            "ts", "start_ts", "end_ts", 1.0, keys=["user_id"],
        )


def test_range_join_left_with_null_point_columns(spark):
    """ADVICE r4: a matched point row carrying a NULL column must not be
    re-emitted null-padded by the left reconstruction (the old anti-join
    on all columns was null-unsafe). Also duplicate point rows must each
    keep exactly their own match multiplicity."""
    from fulltextsearchengine_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [
            (1, None, _ts("2024-01-01 00:05:00")),  # matched, NULL payload
            (2, "x", _ts("2024-01-01 02:00:00")),   # unmatched
            (3, "y", _ts("2024-01-01 00:06:00")),   # matched
            (3, "y", _ts("2024-01-01 00:06:00")),   # duplicate matched row
            (4, None, _ts("2024-01-01 03:00:00")),  # unmatched, NULL payload
        ],
        "event_id long, payload string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(7, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:30:00"))],
        "session_idx long, start_ts timestamp, end_ts timestamp",
    )
    out = range_join(pts, iv, "ts", "start_ts", "end_ts", 60.0, how="left")
    rows = sorted(
        (r["event_id"], r["session_idx"]) for r in out.collect()
    )
    assert rows == [(1, 7), (2, None), (3, 7), (3, 7), (4, None)]


def test_range_join_fanout_guard(spark):
    """A year-long interval at 7-s buckets must fail loudly, not explode
    to millions of rows; max_span_buckets=None restores the old behavior."""
    from pyspark.errors import PySparkRuntimeError
    from fulltextsearchengine_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(1, _ts("2024-06-01 00:00:00"))], "event_id long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(9, _ts("2024-01-01 00:00:00"), _ts("2024-12-31 00:00:00"))],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    guarded = range_join(pts, iv, "ts", "start_ts", "end_ts", 7.0)
    with pytest.raises(Exception, match="max_span_buckets"):
        guarded.collect()
    ok = range_join(
        pts, iv, "ts", "start_ts", "end_ts", 7.0, max_span_buckets=None
    )
    assert [r["iv_id"] for r in ok.collect()] == [9]


# ------------------------------------------------------- heavy hitters


@pytest.fixture(scope="module")
def skewed_index(spark):
    """Zipf-ish corpus with vocab >> sketch counters so Misra-Gries
    eviction actually happens."""
    from fulltextsearchengine_spark.operators.index_build import build_index

    rows = []
    tid = 0
    for v in range(400):  # 400 distinct terms
        reps = 200 if v < 3 else (20 if v < 20 else 1)
        for r in range(reps):
            rows.append((f"c{tid % 37}", tid % 11, "user", f"term{v:03d}", "", None))
            tid += 1
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["ts"] = pd.Timestamp("2024-01-01")
    return build_index(spark.createDataFrame(pdf).repartition(8))


def test_heavy_hitters_exact_vs_groupby(spark, skewed_index):
    from fulltextsearchengine_spark.operators.heavyhitters import term_heavy_hitters

    idx = skewed_index
    total = int(idx.stats_row()["total_tokens"])
    for phi in (0.005, 0.02, 0.1):
        got = [(r["term"], r["cf"]) for r in term_heavy_hitters(idx, phi).collect()]
        exact = (
            idx.postings.groupBy("term").agg(F.sum("tf").alias("cf"))
            .filter(F.col("cf") >= phi * total)
            .orderBy(F.desc("cf"), F.asc("term"))
            .collect()
        )
        assert got == [(r["term"], r["cf"]) for r in exact], phi
        assert len(got) > 0


def test_heavy_hitters_sketch_bounds_candidates(spark, skewed_index):
    """The sketch pass must emit ≤ k survivors per partition."""
    from fulltextsearchengine_spark.operators.heavyhitters import _mg_partition

    src = skewed_index.postings.select("term", F.col("tf").cast("long").alias("tf"))
    k = 50
    cand = src.mapInPandas(_mg_partition(k), schema="term string")
    per_part = (
        cand.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_part <= k
    assert cand.distinct().count() < 400  # strictly fewer than the vocab


def test_heavy_hitters_validates(skewed_index):
    from fulltextsearchengine_spark.operators.heavyhitters import term_heavy_hitters

    with pytest.raises(ValueError):
        term_heavy_hitters(skewed_index, 0.0)
    with pytest.raises(ValueError):
        term_heavy_hitters(skewed_index, 0.01, sketch_counters=10)


# ------------------------------------------------- temperature mixture


def test_temperature_weights_endpoints(spark, sf001_docs_tokens):
    from fulltextsearchengine_spark.operators.mixing import temperature_weights

    d = sf001_docs_tokens
    w1 = temperature_weights(d, "source", "n_alnum_tokens", 1.0)
    totals = {
        r["source"]: r["t"]
        for r in d.groupBy("source").agg(F.sum("n_alnum_tokens").alias("t")).collect()
    }
    z = sum(totals.values())
    for dom, w in w1.items():
        assert math.isclose(w, totals[dom] / z)
    w0 = temperature_weights(d, "source", "n_alnum_tokens", 0.0)
    assert all(math.isclose(w, 1.0 / len(w0)) for w in w0.values())
    # tau < 1 compresses: max weight shrinks, min grows
    wh = temperature_weights(d, "source", "n_alnum_tokens", 0.5)
    assert max(wh.values()) < max(w1.values()) + 1e-12
    assert min(wh.values()) > min(w1.values()) - 1e-12


def test_temperature_sample_budget_and_nesting(spark, sf001_docs_tokens):
    from fulltextsearchengine_spark.operators.mixing import (
        mixture_temperature_plan,
        mixture_temperature_sample,
    )

    d = sf001_docs_tokens
    plan = mixture_temperature_plan(d, "source", "n_alnum_tokens", 0.5, 5000.0)
    for dom, (total, w, rate) in plan.items():
        assert 0.0 <= rate <= 1.0 and total > 0 and w > 0
    small = mixture_temperature_sample(d, "source", "n_alnum_tokens", 0.5, 5000.0, "doc_id")
    big = mixture_temperature_sample(d, "source", "n_alnum_tokens", 0.5, 20000.0, "doc_id")
    sids = {r["doc_id"] for r in small.select("doc_id").collect()}
    bids = {r["doc_id"] for r in big.select("doc_id").collect()}
    assert sids <= bids  # nested under budget increase
    got = sum(r["n_alnum_tokens"] for r in small.collect())
    assert got < sum(r["n_alnum_tokens"] for r in d.collect())


def test_temperature_validates(spark, sf001_docs_tokens):
    from fulltextsearchengine_spark.operators.mixing import temperature_weights

    with pytest.raises(ValueError):
        temperature_weights(sf001_docs_tokens, "source", "n_alnum_tokens", -0.1)
    with pytest.raises(ValueError):
        temperature_weights(
            sf001_docs_tokens, "source", "n_alnum_tokens", 1.0, domains=["nope"]
        )


# ------------------------------------------------------------ retention


def test_retention_crafted(spark):
    from fulltextsearchengine_spark.operators.retention import retention_report

    rows = [
        # u1 signs up week of 2024-01-01 (Mon), active weeks 0 and 2
        (1, 1, _ts("2024-01-02 10:00:00"), "signup"),
        (2, 1, _ts("2024-01-16 10:00:00"), "click"),
        # u2 same cohort, active week 0 only
        (3, 2, _ts("2024-01-03 10:00:00"), "signup"),
        # u3 pre-signup activity -> negative offset kept
        (4, 3, _ts("2024-01-01 10:00:00"), "view"),
        (5, 3, _ts("2024-01-10 10:00:00"), "signup"),
        # u4 never signs up -> excluded entirely
        (6, 4, _ts("2024-01-05 10:00:00"), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = retention_report(ev)
    got = {
        (r["cohort_week"], r["week_offset"]): (r["n_active"], r["cohort_size"])
        for r in out.collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2)  # u1+u2 active their signup week
    assert got[("2024-01-01", 2)] == (1, 2)  # only u1 two weeks later
    assert got[("2024-01-08", -1)] == (1, 1)  # u3's pre-signup view
    assert got[("2024-01-08", 0)] == (1, 1)
    assert not any(k[0] == "2024-01-01" and k[1] == 1 for k in got)  # empty cell absent
    ppm = {r["week_offset"]: r["retention_ppm"] for r in out.collect() if r["cohort_week"] == "2024-01-01"}
    assert ppm[2] == 500000


def test_retention_brute_force_parity(spark, sf001_events):
    from fulltextsearchengine_spark.operators.retention import retention_report

    out = retention_report(sf001_events).collect()
    pdf = sf001_events.select("user_id", "ts", "event_type").toPandas()
    su = pdf[pdf.event_type == "signup"].groupby("user_id").ts.min()
    cw = su.dt.to_period("W-SUN").dt.start_time  # pandas Monday-start week
    acts = pdf.assign(aw=pdf.ts.dt.to_period("W-SUN").dt.start_time)[
        ["user_id", "aw"]
    ].drop_duplicates()
    merged = acts.merge(cw.rename("cw"), left_on="user_id", right_index=True)
    merged["off"] = ((merged.aw - merged.cw).dt.days / 7).astype(int)
    cells = merged.groupby([merged.cw.dt.strftime("%Y-%m-%d"), "off"]).size()
    got = {(r["cohort_week"], r["week_offset"]): r["n_active"] for r in out}
    assert len(got) == len(cells) and all(
        got[(c, o)] == n for (c, o), n in cells.items()
    )


def test_asof_forward(spark, asof_frames):
    from fulltextsearchengine_spark.operators.asof import asof_join

    left, right = asof_frames
    out = asof_join(
        left, right, on="user_id", right_cols=["ref_id"], right_id="ref_id",
        direction="forward",
    )
    got = {r["event_id"]: (r["ref_id_r"], r["asof_lag_sec"]) for r in out.collect()}
    assert got[3] == (100, -60.0)   # 00:04 -> earliest at-or-after is 00:05
    assert got[1] == (101, -300.0)  # 00:10 -> 00:15
    assert got[2] == (None, None)   # nothing after 00:20 for user 10
    assert got[5] == (103, 0.0)     # equal ts matches; max ref_id tie rule
    assert got[4] == (None, None)
    with pytest.raises(ValueError):
        asof_join(left, right, on="user_id", direction="nearest")


def test_asof_forward_matches_pandas(spark, sf001_events):
    from fulltextsearchengine_spark.operators.asof import asof_join

    ev = sf001_events
    left = ev.filter(F.col("event_type") == "signup")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("ref_id")
    )
    out = asof_join(
        left, right, on="user_id", right_cols=["ref_id"], right_id="ref_id",
        direction="forward",
    )
    got = (
        out.select("event_id", "ref_id_r").toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    lp = left.select("event_id", "user_id", "ts").toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="forward")
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert (got["ref_id_r"].fillna(-1) == exp["ref_id"].fillna(-1)).all()


def test_range_join_rejects_column_clash(spark, sf001_events):
    from fulltextsearchengine_spark.operators.rangejoin import range_join

    iv = sf001_events.select(
        "user_id", "ts", F.col("ts").alias("end_ts")
    )
    with pytest.raises(ValueError, match="share non-key columns"):
        range_join(sf001_events, iv, "ts", "ts", "end_ts", 60.0, keys=["user_id"])


# ------------------------------------------- r5 review hardening


def test_asof_presplit_null_key_identity(spark):
    """r5 review: NULL join keys are one window group in the unsplit
    path, so the split path's carry joins must be null-safe — plain
    equi-joins lost the cross-bucket carry for NULL keys."""
    from fulltextsearchengine_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, None, _ts("2024-01-02 00:00:00")),   # matches carry from day 1
            (2, None, _ts("2024-01-01 00:20:00")),   # in-bucket match
            (3, 10, _ts("2024-01-02 00:00:00")),     # real key, cross-bucket
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, None, _ts("2024-01-01 00:10:00"), "n1"),
            (101, 10, _ts("2024-01-01 00:10:00"), "k1"),
        ],
        "ref_id long, user_id long, ts timestamp, tag string",
    )
    kw = dict(on="user_id", right_cols=["ref_id", "tag"], right_id="ref_id")
    plain = asof_join(left, right, **kw)
    split = asof_join(left, right, split_bucket_seconds=3600.0, **kw)
    assert split.exceptAll(plain).count() == 0
    assert plain.exceptAll(split).count() == 0
    got = {r["event_id"]: r["ref_id_r"] for r in split.collect()}
    assert got == {1: 100, 2: 100, 3: 101}


def test_asof_decimal_tie_break_exact(spark):
    """r5 review: decimal(38,0) ids > 2^53 must keep exact tie-breaks
    (the bigint fix applied to decimals too)."""
    from decimal import Decimal

    from fulltextsearchengine_spark.operators.asof import asof_join

    big = 1 << 60
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:30:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (Decimal(big + 1), 10, _ts("2024-01-01 00:30:00"), "hi"),
            (Decimal(big), 10, _ts("2024-01-01 00:30:00"), "lo"),
        ],
        "ref_id decimal(38,0), user_id long, ts timestamp, tag string",
    )
    out = asof_join(
        left, right, on="user_id", right_cols=["ref_id", "tag"], right_id="ref_id"
    ).collect()
    assert out[0]["tag_r"] == "hi"


def test_funnel_presplit_null_user_identity(spark):
    """r5 review: a NULL user's funnel must be computed, not reported as
    steps_completed=0 (the all_users join back must be null-safe)."""
    from fulltextsearchengine_spark.operators.funnel import funnel_report

    rows = [
        (1, None, _ts("2024-01-01 00:00:00"), "view"),
        (2, None, _ts("2024-01-02 00:10:00"), "click"),  # next bucket
        (3, 10, _ts("2024-01-01 00:00:00"), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    steps = ["view", "click"]
    plain = funnel_report(ev, steps)
    split = funnel_report(ev, steps, split_bucket_seconds=86400.0)
    assert split.exceptAll(plain).count() == 0
    assert plain.exceptAll(split).count() == 0
    null_row = [r for r in split.collect() if r["user_id"] is None][0]
    assert null_row["steps_completed"] == 2


def test_range_join_left_shared_lineage_no_row_id(spark, sf001_events):
    """r5 review: how='left' is now ONE left join with the containment
    predicate in the join condition — no monotonically_increasing_id
    (whose two-branch evaluation could re-id rows nondeterministically
    when the points side comes out of a shuffle, e.g. session_stats)."""
    from fulltextsearchengine_spark.operators.rangejoin import range_join
    from fulltextsearchengine_spark.operators.sessions import session_stats

    ev = sf001_events
    pts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    iv = session_stats(ev, gap_seconds=2 * 86400.0).select(
        "user_id", "session_idx", "start_ts", "end_ts"
    )
    out = range_join(
        pts, iv, "ts", "start_ts", "end_ts", 86400.0, keys=["user_id"], how="left"
    )
    assert "monotonically_increasing_id" not in out._jdf.queryExecution().toString()
    inner = range_join(
        pts, iv, "ts", "start_ts", "end_ts", 86400.0, keys=["user_id"], how="inner"
    )
    n_pts = pts.count()
    n_inner = inner.count()
    matched_pts = inner.select("event_id").distinct().count()
    # left = all inner matches + one null-padded row per matchless point
    assert out.count() == n_inner + (n_pts - matched_pts)
    assert out.filter(F.col("session_idx").isNull()).count() == n_pts - matched_pts
    assert out.exceptAll(inner).filter(F.col("session_idx").isNotNull()).count() == 0
