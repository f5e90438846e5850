"""Agent-transcript analytics: tool-transition bigrams and role profile."""

from __future__ import annotations

from datetime import datetime

from relationextractionpipeline_spark.operators import agentstats

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _t(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_tool_transitions_orders_within_conversation(spark):
    ts = datetime(2026, 1, 1)
    rows = [
        # conv a: search -> python -> python (two transitions)
        ("a", 0, "user", "q", "", ts),
        ("a", 1, "tool", "r", "search", ts),
        ("a", 3, "tool", "r", "python", ts),
        ("a", 5, "tool", "r", "python", ts),
        # conv b: browser alone (no transition); non-tool roles ignored
        ("b", 0, "tool", "r", "browser", ts),
        ("b", 1, "assistant", "x", "", ts),
        # conv c: out-of-order turn_idx must still order search -> browser
        ("c", 9, "tool", "r", "browser", ts),
        ("c", 2, "tool", "r", "search", ts),
    ]
    out = {
        (r.prev_tool, r.tool): r.n_transitions
        for r in agentstats.tool_transitions(_t(spark, rows)).collect()
    }
    assert out == {
        ("search", "python"): 1,
        ("python", "python"): 1,
        ("search", "browser"): 1,
    }


def test_role_stats_profile(spark):
    ts = datetime(2026, 1, 1)
    rows = [
        ("a", 0, "user", "ab", "", ts),
        ("a", 1, "user", "abcd", "", ts),
        ("b", 0, "user", "", "", ts),
        ("b", 1, "tool", "xyz", "python", ts),
    ]
    out = {r.role: r for r in agentstats.role_stats(_t(spark, rows)).collect()}
    assert out["user"].n_turns == 3
    assert out["user"].n_convs == 2
    assert out["user"].mean_chars == 2.0
    assert out["tool"].n_turns == 1 and out["tool"].n_convs == 1
