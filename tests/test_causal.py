"""cuped_adjust / ate_strata units: numpy-differential theta, variance
reduction, NULL-covariate neutrality, degenerate slices, per-key fits;
stratified ATE vs a pandas replay, empty-arm strata exclusion."""

from __future__ import annotations

import numpy as np
import pandas as pd

from didtool_spark.operators.causal import ate_strata, cuped_adjust

RNG = np.random.default_rng(7)


def test_cuped_matches_numpy_and_reduces_variance(spark):
    n = 400
    x = RNG.normal(10, 3, n)
    y = 2.0 * x + RNG.normal(0, 1, n)
    pdf = pd.DataFrame({"i": range(n), "x": x, "y": y})
    out = (
        cuped_adjust(spark.createDataFrame(pdf), "y", "x")
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    assert abs(out.theta.iloc[0] - theta) < 1e-9
    expect = y - theta * (x - x.mean())
    np.testing.assert_allclose(out.y_cuped.to_numpy(), expect, rtol=1e-9)
    assert np.var(out.y_cuped) < 0.5 * np.var(y)
    # CUPED preserves the mean
    assert abs(out.y_cuped.mean() - y.mean()) < 1e-9


def test_cuped_null_x_left_unadjusted(spark):
    pdf = pd.DataFrame(
        {"i": [0, 1, 2, 3], "x": [1.0, 2.0, None, 4.0],
         "y": [10.0, 20.0, 30.0, 40.0]}
    )
    out = (
        cuped_adjust(spark.createDataFrame(pdf), "y", "x")
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert out.y_cuped.iloc[2] == 30.0


def test_cuped_degenerate_variance(spark):
    pdf = pd.DataFrame({"i": [0, 1], "x": [5.0, 5.0], "y": [1.0, 9.0]})
    out = cuped_adjust(spark.createDataFrame(pdf), "y", "x").toPandas()
    assert (out.theta == 0.0).all()
    assert sorted(out.y_cuped) == [1.0, 9.0]


def test_cuped_per_key_fits(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 50 + ["b"] * 50,
            "x": np.r_[RNG.normal(0, 1, 50), RNG.normal(0, 1, 50)],
        }
    )
    pdf["y"] = np.where(pdf.k == "a", 3.0, -2.0) * pdf.x + RNG.normal(
        0, 0.1, 100
    )
    out = cuped_adjust(spark.createDataFrame(pdf), "y", "x", keys="k")
    thetas = {
        r["k"]: r["theta"]
        for r in out.select("k", "theta").distinct().collect()
    }
    assert abs(thetas["a"] - 3.0) < 0.2
    assert abs(thetas["b"] + 2.0) < 0.2


def _pandas_ate(pdf):
    cells = (
        pdf.groupby("s")
        .apply(
            lambda g: pd.Series(
                {
                    "n": len(g),
                    "mean_t": g.loc[g.t, "y"].mean(),
                    "mean_c": g.loc[~g.t, "y"].mean(),
                }
            ),
            include_groups=False,
        )
        .reset_index()
    )
    cells["effect"] = cells.mean_t - cells.mean_c
    ok = cells.dropna(subset=["effect"])
    return float((ok.effect * ok.n).sum() / ok.n.sum())


def test_ate_strata_matches_pandas(spark):
    n = 600
    pdf = pd.DataFrame(
        {
            "s": RNG.integers(0, 4, n),
            "t": RNG.random(n) < 0.5,
            "y": RNG.normal(0, 1, n),
        }
    )
    pdf.loc[pdf.t, "y"] += 1.5  # true effect
    out = ate_strata(
        spark.createDataFrame(pdf), "t", "y", "s"
    ).toPandas()
    overall = out[out.is_overall].iloc[0]
    assert abs(overall.effect - _pandas_ate(pdf)) < 1e-9
    assert overall.n == n
    # one row per stratum + the overall row
    assert len(out) == pdf.s.nunique() + 1


def test_ate_strata_empty_arm_excluded(spark):
    pdf = pd.DataFrame(
        {
            "s": [0, 0, 1, 1],
            "t": [True, False, True, True],  # stratum 1: no control
            "y": [2.0, 1.0, 9.0, 9.0],
        }
    )
    out = ate_strata(spark.createDataFrame(pdf), "t", "y", "s").toPandas()
    s1 = out[out.stratum == "1"].iloc[0]
    assert pd.isna(s1.effect) and pd.isna(s1.mean_c)
    overall = out[out.is_overall].iloc[0]
    assert overall.n == 2  # only the identified stratum
    assert abs(overall.effect - 1.0) < 1e-12


def test_welch_t_matches_numpy(spark):
    n_t, n_c = 120, 80
    yt = RNG.normal(1.0, 2.0, n_t)
    yc = RNG.normal(0.2, 1.0, n_c)
    pdf = pd.DataFrame(
        {"t": [True] * n_t + [False] * n_c, "y": np.r_[yt, yc]}
    )
    from didtool_spark.operators.causal import welch_t

    out = welch_t(spark.createDataFrame(pdf), "t", "y").toPandas().iloc[0]
    vt, vc = yt.var(ddof=1), yc.var(ddof=1)
    se = np.sqrt(vt / n_t + vc / n_c)
    t_ref = (yt.mean() - yc.mean()) / se
    dof_ref = (vt / n_t + vc / n_c) ** 2 / (
        (vt / n_t) ** 2 / (n_t - 1) + (vc / n_c) ** 2 / (n_c - 1)
    )
    assert out.n_t == n_t and out.n_c == n_c
    assert abs(out.t_stat - t_ref) < 1e-9
    assert abs(out.dof - dof_ref) < 1e-6
    assert abs(out["diff"] - (yt.mean() - yc.mean())) < 1e-9
    # a real 0.8-sigma effect at n=200 is highly significant
    assert out.t_stat > 2.5


def test_cuped_null_key_slice_kept(spark):
    """A NULL key value is a real slice: rows must survive the stats
    join and get their own theta."""
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "a", None, None, None],
            "x": [1.0, 2.0, 3.0, 1.0, 2.0, 3.0],
            "y": [2.0, 4.0, 6.0, -1.0, -2.0, -3.0],
        }
    )
    out = cuped_adjust(spark.createDataFrame(pdf), "y", "x", keys="k").toPandas()
    assert len(out) == 6
    null_rows = out[out.k.isna()]
    assert len(null_rows) == 3
    assert abs(null_rows.theta.iloc[0] + 1.0) < 1e-9  # slope of its own slice
    assert abs(out[out.k == "a"].theta.iloc[0] - 2.0) < 1e-9
