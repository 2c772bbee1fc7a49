"""loop_stats: per-conversation repetition rollup vs a hand oracle."""

from pyspark.sql import functions as F

from didtool_spark.operators.transcript import loop_stats


def test_loop_stats_matches_hand_oracle(spark):
    rows = [
        # conv A: x y x x x z -> 3 repeats, run of 2 immediate repeats
        ("A", 0, "x"), ("A", 1, "y"), ("A", 2, "x"),
        ("A", 3, "x"), ("A", 4, "x"), ("A", 5, "z"),
        # conv B: all distinct
        ("B", 0, "p"), ("B", 1, "q"), ("B", 2, "r"),
        # conv C: normalization — same after lower/ws-collapse
        ("C", 0, "Hello  World"), ("C", 1, "hello world"),
        # conv D: nulls normalize to the empty string and repeat
        ("D", 0, None), ("D", 1, None), ("D", 2, "ok"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {
        r["conv_id"]: r
        for r in loop_stats(
            df, loop_frac_threshold=0.5, max_run_threshold=3
        ).collect()
    }
    a = out["A"]
    assert (a["n_turns"], a["n_repeat_turns"], a["max_imm_run"]) == (6, 3, 2)
    assert abs(a["loop_frac"] - 0.5) < 1e-9 and a["is_looping"]
    b = out["B"]
    assert (b["n_repeat_turns"], b["max_imm_run"], b["is_looping"]) == (0, 0, False)
    c = out["C"]
    assert (c["n_repeat_turns"], c["max_imm_run"]) == (1, 1) and c["is_looping"]
    d = out["D"]
    assert (d["n_repeat_turns"], d["max_imm_run"]) == (1, 1)


def test_loop_stats_single_exchange(spark):
    """All three window/group steps must share one conv-keyed hash
    exchange (lag on (conv), first-occurrence on (conv, hash), rollup
    on (conv) — conv partitioning clusters every one of them)."""
    import re

    from tests.test_plan_shape import plan_str

    df = spark.createDataFrame(
        [("A", 0, "x")], "conv_id string, turn_idx int, text string"
    )
    p = plan_str(loop_stats(df))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_render_conversations_order_and_nulls(spark):
    from didtool_spark.operators.transcript import render_conversations

    rows = [
        ("A", 2, "assistant", "fine"),
        ("A", 0, "user", "hi"),
        ("A", 1, "tool", None),
        ("B", 0, None, "solo"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {r["conv_id"]: r for r in render_conversations(df).collect()}
    assert out["A"]["text"] == "user: hi\ntool: \nassistant: fine"
    assert out["A"]["n_turns"] == 3
    assert out["A"]["n_chars"] == len(out["A"]["text"])
    assert out["B"]["text"] == ": solo"


def test_render_conversations_single_exchange(spark):
    import re

    from tests.test_plan_shape import plan_str

    from didtool_spark.operators.transcript import render_conversations

    df = spark.createDataFrame(
        [("A", 0, "user", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    p = plan_str(render_conversations(df))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "Window" not in p  # order restored inside the aggregate
