"""kaplan_meier units: textbook hand-worked curve, censoring-only
durations, exact-zero tail, Greenwood std errors, per-group curves."""

from __future__ import annotations

import math

import pandas as pd

from didtool_spark.operators.survival import kaplan_meier


def _km(spark, rows, groups=None):
    pdf = pd.DataFrame(rows, columns=["g", "t", "obs"])
    df = spark.createDataFrame(pdf)
    out = kaplan_meier(df, "t", "obs", group_cols=groups)
    order = (["g"] if groups else []) + ["duration"]
    return out.toPandas().sort_values(order).reset_index(drop=True)


def test_km_textbook_curve(spark):
    # classic worked example: deaths at 1 (n=5), censor at 2, death at 3
    rows = [
        ("a", 1, True), ("a", 1, True), ("a", 2, False),
        ("a", 3, True), ("a", 4, False),
    ]
    out = _km(spark, rows)
    assert list(out.duration) == [1, 2, 3, 4]
    assert list(out.n_risk) == [5, 3, 2, 1]
    assert list(out.n_event) == [2, 0, 1, 0]
    assert list(out.n_censor) == [0, 1, 0, 1]
    s1 = 1 - 2 / 5
    s3 = s1 * (1 - 1 / 2)
    assert abs(out.survival[0] - s1) < 1e-12
    assert abs(out.survival[1] - s1) < 1e-12  # censor-only: no drop
    assert abs(out.survival[2] - s3) < 1e-12
    # Greenwood at t=3: S * sqrt(2/(5*3) + 1/(2*1))
    g = s3 * math.sqrt(2 / 15 + 1 / 2)
    assert abs(out.std_err[2] - g) < 1e-12


def test_km_exact_zero_tail(spark):
    rows = [("a", 1, True), ("a", 2, True)]
    out = _km(spark, rows)
    assert out.survival.iloc[-1] == 0.0
    assert pd.isna(out.std_err.iloc[-1])
    # and stays 0 afterwards if later censored rows existed
    rows2 = [("a", 1, True), ("a", 1, True)]
    out2 = _km(spark, rows2)
    assert list(out2.survival) == [0.0]


def test_km_groups_independent(spark):
    rows = [
        ("a", 1, True), ("a", 2, False),
        ("b", 1, False), ("b", 2, True), ("b", 3, True),
    ]
    out = _km(spark, rows, groups="g")
    a = out[out.g == "a"]
    b = out[out.g == "b"]
    assert abs(a.survival.iloc[0] - 0.5) < 1e-12
    # b: censor at 1 (n=3), death at 2 (n=2), death at 3 (n=1)
    assert list(b.n_risk) == [3, 2, 1]
    assert abs(b.survival.iloc[1] - 0.5) < 1e-12
    assert b.survival.iloc[2] == 0.0


def test_km_null_durations_dropped(spark):
    rows = [("a", 1, True), ("a", None, True), ("a", 2, False)]
    out = _km(spark, rows)
    assert list(out.duration) == [1, 2]
    assert list(out.n_risk) == [2, 1]
