"""group_quantiles / heavy_hitters vs hand + numpy oracles."""

from __future__ import annotations

import numpy as np

from didtool_spark.operators.stats_features import group_quantiles, heavy_hitters


def test_group_quantiles_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = [
        (f"u{int(i % 4)}", float(v))
        for i, v in enumerate(rng.normal(0, 10, 200))
    ]
    df = spark.createDataFrame(rows, "user_id string, v double")
    got = {
        r["user_id"]: (r["v_p50"], r["v_p90"])
        for r in group_quantiles(df, "v", [0.5, 0.9], keys="user_id").collect()
    }
    by_key: dict[str, list[float]] = {}
    for u, v in rows:
        by_key.setdefault(u, []).append(v)
    for u, vals in by_key.items():
        exp50 = float(np.quantile(vals, 0.5))  # linear interpolation
        exp90 = float(np.quantile(vals, 0.9))
        assert abs(got[u][0] - exp50) < 1e-9, u
        assert abs(got[u][1] - exp90) < 1e-9, u


def test_group_quantiles_join_back_broadcasts(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], "user_id string, v double"
    )
    out = group_quantiles(df, "v", [0.5], join_back=True)
    rows = {(r["user_id"], r["v"]): r["v_p50"] for r in out.collect()}
    assert rows[("a", 1.0)] == 2.0 and rows[("b", 5.0)] == 5.0
    from tests.test_plan_shape import plan_str

    assert "BroadcastHashJoin" in plan_str(out)


def test_group_quantiles_approx_same_shape(spark):
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)], "user_id string, v double"
    )
    exact = group_quantiles(df, "v", [0.5]).collect()[0]
    approx = group_quantiles(df, "v", [0.5], approx=True).collect()[0]
    # t-digest at accuracy 10k over 100 uniform points is exact-ish
    assert abs(float(exact["v_p50"]) - float(approx["v_p50"])) <= 1.0


def test_heavy_hitters_hand_oracle(spark):
    rows = (
        [("u1", "a")] * 5 + [("u1", "b")] * 3 + [("u1", "c")] * 3
        + [("u1", "d")] + [("u2", "z")]
    )
    df = spark.createDataFrame(rows, "user_id string, item string")
    got = [
        (r["rank"], r["item"], r["n"])
        for r in heavy_hitters(df, "item", k=2)
        .where("user_id = 'u1'").orderBy("rank").collect()
    ]
    # tie between b and c at 3 -> item ASC wins
    assert got == [(1, "a", 5), (2, "b", 3)]
    u2 = heavy_hitters(df, "item", k=2).where("user_id = 'u2'").collect()
    assert [(r["rank"], r["item"], r["n"]) for r in u2] == [(1, "z", 1)]


def test_heavy_hitters_shuffle_carries_distinct_pairs(spark):
    """The per-key window must run over the AGGREGATED count table:
    partial_count (map-side combine) feeds the first exchange, and the
    rank filter is pushed below the second exchange as a Partial
    WindowGroupLimit (Spark 4 top-k pushdown), so neither shuffle ever
    carries per-event rows."""
    from tests.test_plan_shape import plan_str

    df = spark.createDataFrame(
        [("u", "x")], "user_id string, item string"
    )
    p = plan_str(heavy_hitters(df, "item"))
    assert "partial_count" in p, p
    assert "WindowGroupLimit" in p, p


# ------------------------------------------------------------- seq_ngrams

def test_seq_ngrams_hand_fixture_and_bucketed(spark):
    """3-grams along each key's order: first n-1 rows start no gram,
    NULL values are real levels inside grams, min_count prunes, and
    the bucketed lag strategy is output-identical."""
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from didtool_spark.operators.seq_features import seq_ngrams

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, None), ("c1", 3, "b"),
        ("c2", 0, "a"), ("c2", 1, "b"), ("c2", 2, None),
        ("c3", 0, "x"), ("c3", 1, "y"),   # too short for any 3-gram
    ]
    df = spark.createDataFrame(
        [(k, i, t0 + dt.timedelta(seconds=i), v) for k, i, v in rows],
        "conv_id string, turn_idx int, ts timestamp, v string",
    )
    out = {
        (r["g1"], r["g2"], r["g3"]): r["n"]
        for r in seq_ngrams(df, "v", n=3).collect()
    }
    assert out == {("a", "b", None): 2, ("b", None, "b"): 1}

    pruned = {
        (r["g1"], r["g2"], r["g3"]): r["n"]
        for r in seq_ngrams(df, "v", n=3, min_count=2).collect()
    }
    assert pruned == {("a", "b", None): 2}

    per_key = seq_ngrams(df, "v", n=2, per_key=True)
    assert per_key.where(F.col("conv_id") == "c3").count() == 1

    b = {
        (r["g1"], r["g2"], r["g3"]): r["n"]
        for r in seq_ngrams(
            df, "v", n=3, strategy="bucketed", bucket_seconds=2
        ).collect()
    }
    assert b == out

    with pytest.raises(ValueError, match="n must be"):
        seq_ngrams(df, "v", n=1)
