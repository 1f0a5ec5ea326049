"""Tests for conversation context assembly / SFT example extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _transcripts(spark):
    rows = [
        ("c1", 0, "user", "hi there", None, None),
        ("c1", 1, "assistant", "hello", None, None),
        ("c1", 2, "user", None, None, None),          # null text
        ("c1", 3, "assistant", "still here", None, None),
        ("c2", 0, "assistant", "opener", None, None),  # no context → excluded
        ("c2", 1, "user", "ok", None, None),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_context_windows_content_and_truncation(spark):
    from fulltextsearchengine_spark.operators.conversations import conv_context_windows

    got = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in conv_context_windows(_transcripts(spark), n_context=2).collect()
    }
    assert got[("c1", 0)] == ""
    assert got[("c1", 1)] == "user: hi there"
    assert got[("c1", 2)] == "user: hi there\nassistant: hello"
    # frame bounded at 2: turn 0 falls out; null text renders empty
    assert got[("c1", 3)] == "assistant: hello\nuser: "
    assert got[("c2", 0)] == ""


def test_sft_examples_targets_and_filter(spark):
    from fulltextsearchengine_spark.operators.conversations import sft_examples

    rows = sft_examples(_transcripts(spark), n_context=2).collect()
    got = {(r["conv_id"], r["turn_idx"]): (r["context"], r["target"]) for r in rows}
    # c1 turns 1 and 3 are assistant with context; c2 turn 0 has none
    assert set(got) == {("c1", 1), ("c1", 3)}
    assert got[("c1", 1)] == ("user: hi there", "hello")
    assert got[("c1", 3)] == ("assistant: hello\nuser: ", "still here")


def test_context_windows_rejects_bad_n(spark):
    from fulltextsearchengine_spark.operators.conversations import conv_context_windows

    with pytest.raises(ValueError):
        conv_context_windows(_transcripts(spark), n_context=0)


def test_context_windows_single_exchange_plan(spark):
    # one shuffle on conv_id, no Python in the plan
    from fulltextsearchengine_spark.operators.conversations import conv_context_windows

    plan = (
        conv_context_windows(_transcripts(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan


def test_conv_health_report(spark):
    import datetime as dt
    import pandas as pd

    from fulltextsearchengine_spark.operators.conversations import conv_health_report
    from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    ts = dt.datetime(2026, 1, 1)
    rows = [
        # healthy: system, user, assistant(tool), user
        ("h", 0, "system", "s", None, ts),
        ("h", 1, "user", "u", None, ts),
        ("h", 2, "assistant", "a", "search", ts),
        ("h", 3, "user", "u2", None, ts),
        # stuck agent: assistant loops same tool 3x, no system start
        ("bad", 0, "user", "q", None, ts),
        ("bad", 1, "assistant", "a1", "search", ts),
        ("bad", 2, "assistant", "a2", "search", ts),
        ("bad", 3, "assistant", "a3", "search", ts),
        ("bad", 4, "assistant", "a4", "calc", ts),
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        schema=TRANSCRIPT_SCHEMA,
    )
    got = {r["conv_id"]: r.asDict() for r in conv_health_report(sdf).collect()}
    h = got["h"]
    assert (h["n_turns"], h["n_same_role_repeats"], h["max_same_role_run"]) == (4, 0, 1)
    assert (h["n_tool_turns"], h["max_tool_run"], h["starts_with_system"]) == (1, 1, 1)
    b = got["bad"]
    assert (b["n_turns"], b["n_same_role_repeats"], b["max_same_role_run"]) == (5, 3, 4)
    # same tool 3x consecutively, then a different tool -> runs 3 and 1
    assert (b["n_tool_turns"], b["max_tool_run"], b["starts_with_system"]) == (4, 3, 0)
