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

def test_truncate_conversations_head_and_tail(spark):
    from didtool_spark.operators.transcript import truncate_conversations

    rows = [
        # conv A tokens: 5, 10, 20, 100 -> head budget 35 keeps 0,1,2
        ("A", 0, 5), ("A", 1, 10), ("A", 2, 20), ("A", 3, 100),
        # conv B: first turn alone busts the budget -> nothing kept
        ("B", 0, 50),
        # conv C: NULL tokens count 0
        ("C", 0, None), ("C", 1, 30),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, n_tokens int")
    head = truncate_conversations(df, budget=35, keep="head").collect()
    kept = {(r["conv_id"], r["turn_idx"]): r["cum_tokens"] for r in head}
    assert kept == {("A", 0): 5, ("A", 1): 15, ("A", 2): 35,
                    ("C", 0): 0, ("C", 1): 30}
    tail = truncate_conversations(df, budget=35, keep="tail").collect()
    kept_t = {(r["conv_id"], r["turn_idx"]) for r in tail}
    # A from the end: 100 busts immediately -> nothing from A
    assert kept_t == {("C", 0), ("C", 1)}
    import pytest

    with pytest.raises(ValueError):
        truncate_conversations(df, keep="middle")


def test_role_stats_matches_hand_oracle(spark):
    from didtool_spark.operators.transcript import role_stats

    rows = [
        # conv A: user/assistant alternating, clean
        ("A", 0, "user"), ("A", 1, "assistant"),
        ("A", 2, "user"), ("A", 3, "assistant"),
        # conv B: double-assistant violation, ends on user
        ("B", 0, "user"), ("B", 1, "assistant"),
        ("B", 2, "assistant"), ("B", 3, "user"),
        # conv C: NULL role is never "same" as anything, even NULL
        ("C", 0, None), ("C", 1, None), ("C", 2, "user"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = {r["conv_id"]: r for r in role_stats(df).collect()}
    a = out["A"]
    assert (a["n_turns"], a["n_distinct_roles"], a["n_same_role_adjacent"]) == (4, 2, 0)
    assert (a["first_role"], a["last_role"]) == ("user", "assistant")
    b = out["B"]
    assert (b["n_same_role_adjacent"], b["last_role"]) == (1, "user")
    c = out["C"]
    assert (c["n_turns"], c["n_distinct_roles"], c["n_same_role_adjacent"]) == (3, 1, 0)


def test_role_stats_single_exchange(spark):
    import re

    from tests.test_plan_shape import plan_str

    from didtool_spark.operators.transcript import role_stats

    df = spark.createDataFrame(
        [("A", 0, "user")], "conv_id string, turn_idx int, role string"
    )
    p = plan_str(role_stats(df))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_with_json_fields_types_and_malformed(spark):
    from didtool_spark.functions.exprs import with_json_fields

    rows = [
        ('{"k": 69, "name": "a", "score": 1.5}',),
        ('{"k": "not-a-number"}',),
        ("not json at all",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "props string")
    out = with_json_fields(
        df, "props",
        {"k": ("$.k", "long"), "name": ("$.name", "string"),
         "score": ("$.score", "double")},
    ).collect()
    assert (out[0]["k"], out[0]["name"], out[0]["score"]) == (69, "a", 1.5)
    assert out[1]["k"] is None          # try_cast, not a task failure
    assert out[2]["k"] is None and out[3]["k"] is None

def test_attach_outcome_labels_and_remaining(spark):
    from didtool_spark.operators.transcript import attach_outcome

    rows = [
        ("A", 0, "user", "hi"), ("A", 1, "assistant", "yes"),
        ("A", 2, "user", None),          # final text is NULL -> propagated
        ("B", 0, "user", "solo"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {(r["conv_id"], r["turn_idx"]): r for r in attach_outcome(df).collect()}
    for i in range(3):
        r = out[("A", i)]
        assert r["final_role"] == "user" and r["final_text"] is None
        assert r["turns_remaining"] == 2 - i
    b = out[("B", 0)]
    assert (b["final_role"], b["final_text"], b["turns_remaining"]) == (
        "user", "solo", 0
    )


def test_attach_outcome_single_exchange(spark):
    import re

    from tests.test_plan_shape import plan_str

    from didtool_spark.operators.transcript import attach_outcome

    df = spark.createDataFrame(
        [("A", 0, "user", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    p = plan_str(attach_outcome(df))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p

def test_truncate_bucketed_matches_window(spark):
    """Carry-in bucketed strategy must be output-identical to the
    window strategy (bucket_size=2 forces multi-bucket conversations),
    for both head and tail."""
    import pandas as pd

    from didtool_spark.operators.transcript import truncate_conversations

    rows = []
    for conv in ("A", "B", "C"):
        for i in range(11):
            rows.append((conv, i, (i * 7 + len(conv)) % 13 + 1))
    rows.append(("D", 0, None))  # NULL tokens count 0 in both paths
    rows.append(("D", 1, 4))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, n_tokens int")
    for keep in ("head", "tail"):
        a = truncate_conversations(
            df, budget=30, keep=keep, strategy="bucketed", bucket_size=2
        ).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        b = truncate_conversations(
            df, budget=30, keep=keep, strategy="window"
        ).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=True)


def test_truncate_bucketed_prunes_far_buckets(spark):
    """The physical plan must filter on the carry BEFORE the in-bucket
    window — the property that bounds work on a 10^9-turn hot
    conversation."""
    from didtool_spark.operators.transcript import truncate_conversations

    df = spark.createDataFrame(
        [("A", i, 10) for i in range(20)],
        "conv_id string, turn_idx int, n_tokens int",
    )
    out = truncate_conversations(
        df, budget=35, keep="head", strategy="bucketed", bucket_size=2
    )
    from tests.test_plan_shape import plan_str

    p = plan_str(out)
    # the carry-budget prune must survive into the physical plan (it
    # sits below the in-bucket window in the DataFrame chain, so the
    # window never sees a bucket that cannot contribute kept rows)
    assert "__carry" in p and "35" in p, p
    assert {(r["turn_idx"], r["cum_tokens"]) for r in out.collect()} == {
        (0, 10), (1, 20), (2, 30)
    }


def _rand_transcript(seed: int, n_convs: int = 8, max_turns: int = 25):
    """Randomized differential fixture: heavy repetition (3-letter
    alphabet), NULL texts/roles, run lengths that straddle any
    bucket_size >= 2."""
    import random

    rng = random.Random(seed)
    rows = []
    for c in range(n_convs):
        conv = f"c{c}"
        n = rng.randint(1, max_turns)
        t = 0
        while t < n:
            text = rng.choice(["aa", "bb", "cc", None])
            role = rng.choice(["user", "assistant", "tool", None])
            run = rng.randint(1, 6)  # deliberate immediate-repeat runs
            for _ in range(min(run, n - t)):
                rows.append((conv, t, role, text))
                t += 1
    return rows


def test_loop_stats_bucketed_matches_window(spark):
    """Bucketed loop_stats is output-identical to the window strategy
    on a randomized repetition-heavy fixture (bucket_size=3 forces runs
    to straddle bucket boundaries)."""
    import pandas as pd

    for seed in (1, 2, 3):
        rows = [(c, i, t) for c, i, _, t in _rand_transcript(seed)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        a = loop_stats(df, strategy="bucketed", bucket_size=3).toPandas()
        b = loop_stats(df, strategy="window").toPandas()
        a = a.sort_values("conv_id").reset_index(drop=True)
        b = b.sort_values("conv_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=True)


def test_role_stats_bucketed_matches_window(spark):
    import pandas as pd

    from didtool_spark.operators.transcript import role_stats

    for seed in (4, 5, 6):
        df = spark.createDataFrame(
            _rand_transcript(seed),
            "conv_id string, turn_idx int, role string, text string",
        )
        a = role_stats(df, strategy="bucketed", bucket_size=3).toPandas()
        b = role_stats(df, strategy="window").toPandas()
        a = a.sort_values("conv_id").reset_index(drop=True)
        b = b.sort_values("conv_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=True)


def test_role_stats_bucketed_all_null_roles(spark):
    """An all-NULL-role conversation must still roll up identically on
    both strategies (n_distinct_roles 0, no dropped row)."""
    from didtool_spark.operators.transcript import role_stats

    df = spark.createDataFrame(
        [("A", 0, None), ("A", 1, None), ("B", 0, "user"), ("B", 1, "user")],
        "conv_id string, turn_idx int, role string",
    )
    for strat in ("window", "bucketed"):
        out = {
            r["conv_id"]: r
            for r in role_stats(df, strategy=strat, bucket_size=1).collect()
        }
        assert out["A"]["n_distinct_roles"] == 0
        assert out["A"]["n_same_role_adjacent"] == 0  # NULL = NULL is not a match
        assert out["A"]["first_role"] is None
        assert out["B"]["n_same_role_adjacent"] == 1
        assert out["B"]["n_distinct_roles"] == 1


def test_attach_outcome_bucketed_matches_window(spark):
    import pandas as pd

    from didtool_spark.operators.transcript import attach_outcome

    for seed in (7, 8):
        df = spark.createDataFrame(
            _rand_transcript(seed),
            "conv_id string, turn_idx int, role string, text string",
        )
        kw = dict(outcome_cols=("role", "text"))
        a = attach_outcome(df, strategy="bucketed", bucket_size=3, **kw).toPandas()
        b = attach_outcome(df, strategy="window", **kw).toPandas()
        key = ["conv_id", "turn_idx"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert list(a.columns) == list(b.columns)
        pd.testing.assert_frame_equal(a, b, check_dtype=True)


def test_transcript_bucketed_no_full_conv_window(spark):
    """Scale contract of the bucketed strategies: no window partitions
    by the bare conversation key over row-scale data — full-conv
    windows only ever run on the per-bucket summary tables. We assert
    the row-scale windows all carry the __bucket key."""
    import re

    from didtool_spark.operators.transcript import (
        attach_outcome,
        role_stats,
    )
    from tests.test_plan_shape import plan_str

    df = spark.createDataFrame(
        [("A", i, "user", "x") for i in range(6)],
        "conv_id string, turn_idx int, role string, text string",
    )
    n_row_scale = 0
    for out in (
        loop_stats(df, strategy="bucketed", bucket_size=2),
        role_stats(df, strategy="bucketed", bucket_size=2),
        attach_outcome(df, strategy="bucketed", bucket_size=2),
    ):
        p = plan_str(out)
        # every windowspec ordered by the row-scale order column
        # (__ord / turn_idx) must carry __bucket in its partition keys;
        # bare-conv windows may only order by __bucket (the tiny
        # per-bucket summary tables)
        for m in re.finditer(
            r"windowspecdefinition\(([^)]*?)(?:__ord|turn_idx)#\d+ ASC", p
        ):
            n_row_scale += 1
            assert "__bucket" in m.group(1), p
    assert n_row_scale >= 3  # the regex actually matched per operator


def test_truncate_bucketed_matches_window_randomized(spark):
    """Randomized differential coverage for the truncate carry-in
    strategy (the hand fixture above pins known edges; this sweeps
    budget boundaries landing anywhere in a bucket): random token
    counts incl. NULLs, bucket_size=2 forces multi-bucket carries."""
    import random

    import pandas as pd

    from didtool_spark.operators.transcript import truncate_conversations

    for seed in (11, 12):
        rng = random.Random(seed)
        rows = []
        for c in range(6):
            for i in range(rng.randint(1, 18)):
                rows.append(
                    (f"c{c}", i, rng.choice([None, 1, 2, 5, 9, 20]))
                )
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, n_tokens int"
        )
        budget = rng.choice([7, 23, 40])
        for keep in ("head", "tail"):
            a = truncate_conversations(
                df, budget=budget, keep=keep,
                strategy="bucketed", bucket_size=2,
            ).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            b = truncate_conversations(
                df, budget=budget, keep=keep, strategy="window"
            ).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=True)
