"""Unit + plan-shape tests for operators/profile.py: single-pass table
profiling, deterministic per-group sampling, and join-key skew
diagnostics. Gate queries add the full DuckDB replays at sf0.01."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from didtool_spark.operators.profile import (
    group_sample,
    profile_table,
    skew_stats,
)


def plan_str(df) -> str:
    from io import StringIO
    import contextlib

    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ----------------------------------------------------------------- profile
def test_profile_table_hand_oracle(spark):
    rows = [
        ("a", 1, None),
        ("a", 2, 5.0),
        ("b", 2, 5.0),
        (None, 2, 7.0),
        ("a", None, None),
    ]
    df = spark.createDataFrame(rows, "s string, i int, d double")
    got = {r.column: r.asDict() for r in profile_table(df).collect()}

    s = got["s"]
    assert (s["n_rows"], s["n_null"], s["n_distinct"]) == (5, 1, 2)
    assert (s["top_value"], s["top_count"]) == ("a", 3)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["null_frac"] == 0.2

    i = got["i"]
    assert (i["n_null"], i["n_distinct"]) == (1, 2)
    assert (i["top_value"], i["top_count"]) == ("2", 3)

    d = got["d"]
    assert (d["n_null"], d["n_distinct"]) == (2, 2)
    assert (d["top_value"], d["top_count"]) == ("5.0", 2)


def test_profile_table_top_tie_breaks_by_value(spark):
    df = spark.createDataFrame(
        [("x",), ("y",), ("x",), ("y",)], "c string"
    )
    r = profile_table(df).collect()[0]
    # equal counts -> lexicographically smaller value wins
    assert (r.top_value, r.top_count) == ("x", 2)


def test_profile_table_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "c string")
    r = profile_table(df).collect()[0]
    assert (r.n_rows, r.n_null, r.n_distinct) == (2, 2, 0)
    assert r.top_value is None and r.top_count is None
    assert r.min_str is None and r.max_str is None
    assert r.null_frac == 1.0


def test_profile_single_melted_aggregation(spark):
    """Scale contract: one melted stream, so the per-row shuffle
    carries (column, value) cells — exactly two Exchanges total (cells
    agg + per-column agg), never one scan/agg per column."""
    df = spark.createDataFrame([("a", 1, 2.0)], "s string, i int, d double")
    p = plan_str(profile_table(df))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2


# ------------------------------------------------------------ group_sample
def _md5_rank(rows, k, seed=0):
    out = {}
    by_g: dict = {}
    for gid, rid in rows:
        by_g.setdefault(gid, []).append(rid)
    for g, ids in by_g.items():
        ids.sort(key=lambda i: (hashlib.md5(f"{i}#{seed}".encode()).hexdigest(), i))
        out[g] = set(ids[:k])
    return out


def test_group_sample_exact_k_and_deterministic(spark):
    rows = [(f"g{i % 3}", i) for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, id long")
    got1 = group_sample(df, "grp", k=4, id_col="id").collect()
    got2 = group_sample(
        df.repartition(7), "grp", k=4, id_col="id"
    ).collect()
    by_g: dict = {}
    for r in got1:
        by_g.setdefault(r.grp, set()).add(r.id)
    assert all(len(v) == 4 for v in by_g.values())
    # partition-layout independence
    assert {(r.grp, r.id) for r in got1} == {(r.grp, r.id) for r in got2}
    # matches the reference md5 ordering
    assert by_g == _md5_rank(rows, 4)


def test_group_sample_small_group_returns_all(spark):
    df = spark.createDataFrame([("g", 1), ("g", 2)], "grp string, id long")
    assert len(group_sample(df, "grp", k=10, id_col="id").collect()) == 2


def test_group_sample_plans_window_group_limit(spark):
    df = spark.createDataFrame([("g", 1)], "grp string, id long")
    p = plan_str(group_sample(df, "grp", k=3, id_col="id"))
    assert "WindowGroupLimit" in p


# -------------------------------------------------------------- skew_stats
def test_skew_stats_hand_oracle(spark):
    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [(r.key, r.cnt, r.share, r.skew_factor, r.rank)
           for r in skew_stats(df, "k", top_k=2).collect()]
    # mean count per key = 10/3; skew = cnt / mean
    assert got == [
        ("hot", 6, 0.6, round(6 / (10 / 3), 6), 1),
        ("warm", 3, 0.3, round(3 / (10 / 3), 6), 2),
    ]


def test_skew_stats_topk_no_global_sort(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    p = plan_str(skew_stats(df, "k", top_k=5))
    assert "TakeOrderedAndProject" in p
