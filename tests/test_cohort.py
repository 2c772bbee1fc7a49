"""Units for cohort retention (operators/cohort.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from didtool_spark.operators.cohort import cohort_retention

W0 = dt.datetime(2024, 1, 1)   # a Monday


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, W0 + dt.timedelta(days=d, hours=3)) for k, d in rows],
        "user_id string, ts timestamp",
    )


def test_cohort_hand_fixture(spark):
    rows = [
        # cohort W0: a active weeks 0,1,3; b only week 0
        ("a", 0), ("a", 2), ("a", 8), ("a", 21),
        ("b", 3),
        # cohort W1: c active weeks 1,2
        ("c", 7), ("c", 14),
    ]
    out = {
        (r["cohort_ts"], r["age"]): (r["n_active"], r["n_cohort"],
                                     round(r["retention"], 6))
        for r in cohort_retention(_mk(spark, rows)).collect()
    }
    w1 = W0 + dt.timedelta(days=7)
    assert out[(W0, 0)] == (2, 2, 1.0)      # a and b
    assert out[(W0, 1)] == (1, 2, 0.5)      # only a
    assert out[(W0, 3)] == (1, 2, 0.5)      # a again; week 2 absent
    assert (W0, 2) not in out               # empty cells are not emitted
    assert out[(w1, 0)] == (1, 1, 1.0)
    assert out[(w1, 1)] == (1, 1, 1.0)
    assert len(out) == 5


def test_cohort_age_zero_always_full(spark):
    rows = [(f"u{i}", i % 20) for i in range(60)]
    out = cohort_retention(_mk(spark, rows))
    z = out.where(F.col("age") == 0).collect()
    assert z and all(abs(r["retention"] - 1.0) < 1e-12 for r in z)


def test_cohort_month_grain_and_validation(spark):
    rows = [("a", 0), ("a", 40), ("b", 40)]   # Jan + Feb
    out = {
        (r["cohort_ts"].month, r["age"]): r["n_active"]
        for r in cohort_retention(_mk(spark, rows), grain="month").collect()
    }
    assert out[(1, 0)] == 1 and out[(1, 1)] == 1 and out[(2, 0)] == 1
    with pytest.raises(ValueError, match="grain"):
        cohort_retention(_mk(spark, rows), grain="fortnight")


def test_cohort_single_base_scan(spark, tmp_path):
    """The cells/sizes self-join must reuse the cells aggregate
    exchange at runtime — everything upstream (including the base
    scan) executes once."""
    rows = [(f"u{i % 7}", i % 21) for i in range(200)]
    p = str(tmp_path / "coh")
    _mk(spark, rows).write.mode("overwrite").parquet(p)
    out = cohort_retention(spark.read.parquet(p))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 1, plan
