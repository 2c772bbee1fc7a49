"""Units for resample_grid vs pandas resample semantics: dense grid,
per-bucket aggregation, deterministic last, leakage-free ffill."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from didtool_spark.operators.resample import resample_grid

T0 = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(s), v) for k, s, v in rows],
        "k string, ts timestamp, v double",
    )


def test_resample_last_grid_and_ffill(spark):
    rows = [
        ("a", 5.0, 1.0),
        ("a", 50.0, 2.0),     # same bucket at step 60: last wins
        ("a", 130.0, None),   # bucket 2: only a NULL value
        ("a", 310.0, 9.0),    # bucket 5; buckets 3-4 are gaps
        ("b", 65.0, 7.0),
    ]
    df = _mk(spark, rows)
    out = resample_grid(df, "v", 60, keys="k", agg="last", ffill=False)
    got = {
        (r["k"], r["bucket_ts"]): (r["v_last"], r["n_events"])
        for r in out.collect()
    }
    assert got[("a", _ts(0))] == (2.0, 2)
    assert got[("a", _ts(120))] == (None, 1)   # NULL-only bucket
    assert got[("a", _ts(180))] == (None, 0)   # gap cell
    assert got[("a", _ts(240))] == (None, 0)
    assert got[("a", _ts(300))] == (9.0, 1)
    assert got[("b", _ts(60))] == (7.0, 1)
    assert len([k for k in got if k[0] == "a"]) == 6  # dense 0..5
    assert len([k for k in got if k[0] == "b"]) == 1

    filled = resample_grid(df, "v", 60, keys="k", agg="last", ffill=True)
    gf = {(r["k"], r["bucket_ts"]): r["v_last"] for r in filled.collect()}
    assert gf[("a", _ts(120))] == 2.0   # NULL bucket filled from bucket 0
    assert gf[("a", _ts(240))] == 2.0   # gaps carry forward
    assert gf[("a", _ts(300))] == 9.0   # own value wins over carry


def test_resample_last_same_ts_tiebreak(spark):
    df = _mk(spark, [("a", 10.0, 3.0), ("a", 10.0, 8.0)])
    out = resample_grid(df, "v", 60, keys="k").collect()
    assert out[0]["v_last"] == 8.0  # exact-tie -> larger value, stable


def test_resample_aggs_match_pandas(spark):
    import pandas as pd

    rng = np.random.default_rng(41)
    rows = [("a", float(s), float(v)) for s, v in
            zip(np.sort(rng.uniform(0, 600, 60)), rng.normal(5, 2, 60))]
    df = _mk(spark, rows)
    pdf = pd.DataFrame(rows, columns=["k", "s", "v"])
    pdf["ts"] = pdf["s"].map(_ts)
    res = pdf.set_index("ts").resample("60s")
    for agg, pd_val in (("sum", res["v"].sum()), ("avg", res["v"].mean()),
                        ("max", res["v"].max()), ("count", res["v"].count())):
        out = {r["bucket_ts"]: r[f"v_{agg}"] for r in
               resample_grid(df, "v", 60, keys="k", agg=agg).collect()}
        for t, e in pd_val.items():
            g = out[t.to_pydatetime().replace(tzinfo=None)]
            if agg == "sum" and np.isnan(e):
                # pandas sums an empty bucket to 0.0; SQL sum is NULL
                continue
            if isinstance(e, float) and np.isnan(e):
                assert g is None, (agg, t)
            else:
                assert abs(g - e) < 1e-9, (agg, t, g, e)


def test_resample_single_partitioning_plan(spark):
    import re

    from tests.test_plan_shape import plan_str

    df = _mk(spark, [("a", float(i * 30), float(i)) for i in range(50)])
    out = resample_grid(df, "v", 60, keys="k", ffill=True)
    p = plan_str(out)
    assert "PythonUDF" not in p
    # groupBy(k,b), span agg, grid join and the ffill window all hash
    # on k / (k,b) — bounded exchange count, no single-partition stage
    assert "Exchange SinglePartition" not in p
    n = len(re.findall(r"\(\d+\) Exchange", p))
    assert n <= 4, p[:3000]


# ------------------------------------------------------------ time_rollup

from didtool_spark.operators.resample import time_rollup


def _rollup_fixture(spark):
    # two keys, events spanning two ISO weeks and two months, NULLs mixed in
    rows = [
        ("a", dt.datetime(2024, 1, 31, 22, 10), 1.0),
        ("a", dt.datetime(2024, 1, 31, 22, 40), None),   # same hour, NULL
        ("a", dt.datetime(2024, 1, 31, 23, 5), 3.0),
        ("a", dt.datetime(2024, 2, 1, 0, 30), 5.0),      # next day + month
        ("a", dt.datetime(2024, 2, 5, 9, 0), 7.0),       # next ISO week
        ("b", dt.datetime(2024, 2, 5, 9, 30), -2.0),
        ("b", dt.datetime(2024, 2, 5, 10, 30), None),    # all-NULL hour
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def _direct(df, grain, keys=("k",)):
    """Reference: each grain aggregated straight from the base table."""
    return (
        df.groupBy(*keys, F.date_trunc(grain, "ts").alias("bucket_ts"))
        .agg(
            F.sum("v").alias("v_sum"),
            F.avg("v").alias("v_avg"),
            F.count("v").alias("v_count"),
            F.min("v").alias("v_min"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("grain", F.lit(grain))
    )


def test_time_rollup_merge_equals_direct(spark):
    df = _rollup_fixture(spark)
    specs = [("v", "sum"), ("v", "avg"), ("v", "count"), ("v", "min")]
    out = time_rollup(df, specs, grains=("hour", "day", "week"), keys="k")
    for grain in ("hour", "day", "week"):
        got = {
            (r["k"], r["bucket_ts"]): r
            for r in out.where(F.col("grain") == grain).collect()
        }
        want = {(r["k"], r["bucket_ts"]): r for r in _direct(df, grain).collect()}
        assert set(got) == set(want), grain
        for key, w in want.items():
            g = got[key]
            for c in ("v_sum", "v_avg", "v_min"):
                if w[c] is None:
                    assert g[c] is None, (grain, key, c)
                else:
                    assert abs(g[c] - w[c]) < 1e-9, (grain, key, c)
            assert g["v_count"] == w["v_count"], (grain, key)
            assert g["n_events"] == w["n_events"], (grain, key)


def test_time_rollup_month_skips_week_partial(spark):
    """month never merges week partials (ISO weeks cross month
    boundaries): values must still equal the direct aggregation even
    when 'week' sits between 'day' and 'month' in the grain list."""
    df = _rollup_fixture(spark)
    out = time_rollup(
        df, [("v", "sum"), ("v", "count")],
        grains=("day", "week", "month"), keys="k",
    )
    got = {
        (r["k"], r["bucket_ts"]): (r["v_sum"], r["v_count"])
        for r in out.where(F.col("grain") == "month").collect()
    }
    want = {
        (r["k"], r["bucket_ts"]): (r["v_sum"], r["v_count"])
        for r in _direct(df, "month").collect()
    }
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key][0] - want[key][0]) < 1e-9
        assert got[key][1] == want[key][1]


def test_time_rollup_scans_base_once(spark, tmp_path):
    """Each union branch shares the finer grain's exchange: at runtime
    AQE must fuse the day branch onto the hour branch's shuffle and the
    week branch onto the day merge's shuffle (two ReusedExchange
    stages), so the base parquet is read exactly once."""
    p = str(tmp_path / "ev")
    _rollup_fixture(spark).write.mode("overwrite").parquet(p)
    base = spark.read.parquet(p)
    out = time_rollup(
        base, [("v", "sum"), ("v", "avg")],
        grains=("hour", "day", "week"), keys="k",
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 2, plan


def test_time_rollup_validation(spark):
    df = _rollup_fixture(spark)
    import pytest

    with pytest.raises(ValueError, match="fine -> coarse"):
        time_rollup(df, [("v", "sum")], grains=("day", "hour"), keys="k")
    with pytest.raises(ValueError, match="unknown grain"):
        time_rollup(df, [("v", "sum")], grains=("fortnight",), keys="k")
    with pytest.raises(ValueError, match="unsupported agg"):
        time_rollup(df, [("v", "median")], keys="k")
    with pytest.raises(ValueError, match="unique"):
        time_rollup(df, [("v", "sum")], grains=("day", "day"), keys="k")


# --------------------------------------------------------- distinct_rollup

from didtool_spark.operators.resample import distinct_rollup


def test_distinct_rollup_merge_within_bound_of_direct(spark):
    """The union of day sketches must estimate the week within the same
    error bound as sketching the week directly (the estimates need not
    be numerically identical — a direct small-set sketch may still be
    in datasketches' exact sparse mode while union promotes to dense
    registers)."""
    df = spark.range(5000).select(
        (F.col("id") % 997).alias("u"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") % 14) * 86400 + F.col("id") % 3600
        ).alias("ts"),
    )
    merged = {
        r["bucket_ts"]: r["u_distinct"]
        for r in distinct_rollup(
            df, "u", grains=("day", "week"), keys=(), ts_col="ts"
        ).where(F.col("grain") == "week").collect()
    }
    direct = {
        r["bucket_ts"]: r["u_distinct"]
        for r in distinct_rollup(
            df, "u", grains=("week",), keys=(), ts_col="ts"
        ).collect()
    }
    assert set(merged) == set(direct) and len(merged) >= 2
    for b in direct:  # every day holds all 997 distinct values
        assert abs(merged[b] - 997) <= 0.05 * 997, (b, merged[b])
        assert abs(direct[b] - 997) <= 0.05 * 997, (b, direct[b])


def test_distinct_rollup_estimate_accuracy(spark):
    """At lg_k=12 the estimate's standard error is ~1.6%; the fixture's
    deterministic estimates must land within 5% of exact."""
    df = spark.range(20000).select(
        (F.col("id") * 2654435761 % 7919).alias("u"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") % 7) * 86400
        ).alias("ts"),
    )
    est = {
        (r["grain"], r["bucket_ts"]): r["u_distinct"]
        for r in distinct_rollup(
            df, "u", grains=("day", "week"), keys=(), ts_col="ts"
        ).collect()
    }
    exact = {}
    for g in ("day", "week"):
        for r in (
            df.groupBy(F.date_trunc(g, "ts").alias("b"))
            .agg(F.countDistinct("u").alias("n")).collect()
        ):
            exact[(g, r["b"])] = r["n"]
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= 0.05 * exact[k], (k, est[k], exact[k])


def test_time_rollup_week_led_list_single_scan(spark, tmp_path):
    """grains=('week','month'): the internal day partial must keep the
    base to ONE scan (runtime ReusedExchange) and month must still
    equal the direct aggregation."""
    p = str(tmp_path / "ev2")
    _rollup_fixture(spark).write.mode("overwrite").parquet(p)
    base = spark.read.parquet(p)
    out = time_rollup(
        base, [("v", "sum"), ("v", "count")], grains=("week", "month"),
        keys="k",
    )
    got = {
        (r["k"], r["bucket_ts"]): (r["v_sum"], r["v_count"])
        for r in out.where(F.col("grain") == "month").collect()
    }
    want = {
        (r["k"], r["bucket_ts"]): (r["v_sum"], r["v_count"])
        for r in _direct(base, "month").collect()
    }
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key][0] - want[key][0]) < 1e-9 and got[key][1] == want[key][1]
    out.collect()  # finalize the adaptive plan before reading it
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 1, plan
