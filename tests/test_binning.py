"""Golden tests ported from reference tests/cut_test.py — identical
literal inputs, identical expected bin ids/edges."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from didtool_spark.functions.driver_fit import chi2_isf
from didtool_spark.operators.binning import Binner, cut_with_edges

NAN = float("nan")


def _df(spark, x, target=None):
    if target is None:
        return spark.createDataFrame([(float(v),) for v in x], "x double")
    return spark.createDataFrame(
        [(float(v), int(t)) for v, t in zip(x, target)], "x double, target int"
    )


def _bins(spark, df, method, n_bins, **kw):
    b = Binner(method=method, n_bins=n_bins, **kw).fit(df, "x", "target")
    out = (
        b.transform(df.withColumn("__id", F.monotonically_increasing_id()), "x")
        .orderBy("__id")
        .select("x_bin")
        .toPandas()["x_bin"]
        .tolist()
    )
    return out, b.edges


def test_step_cut(spark):
    x = [0, 1, 2, 2, 3, 6, 8, 10, NAN]
    df = _df(spark, x)
    b = Binner(method="step", n_bins=4).fit(df, "x")
    out = [r["x_bin"] for r in b.transform(df, "x").orderBy("x").collect()]
    # orderBy puts NaN last in Spark; reconstruct by value order
    assert b.edges == [-math.inf, 2.5, 5.0, 7.5, math.inf]
    got, _ = _bins(spark, df, "step", 4)
    assert got == [0, 0, 0, 0, 1, 2, 3, 3, -1]


def test_step_cut_unbalance(spark):
    got, edges = _bins(spark, _df(spark, [0, 1, 2, 2, 3, 3, 3, 10, NAN]), "step", 4)
    assert got == [0, 0, 0, 0, 1, 1, 1, 2, -1]
    assert edges == [-math.inf, 2.5, 7.5, math.inf]

    got, edges = _bins(spark, _df(spark, [0, 6, 8, 8, 8, 9, 10, 10, NAN]), "step", 4)
    assert got == [0, 1, 2, 2, 2, 2, 2, 2, -1]
    assert edges == [-math.inf, 5.0, 7.5, math.inf]


def test_quantile_cut(spark):
    got, _ = _bins(spark, _df(spark, [0, 1, 2, 2, 3, 5, 6, 10, NAN]), "quantile", 4)
    assert got == [0, 0, 1, 1, 2, 2, 3, 3, -1]


def test_quantile_cut_unbalance(spark):
    got, edges = _bins(
        spark, _df(spark, [1, 1, 1, 1, 1, 2, 3, 3, 3, 10, NAN]), "quantile", 4
    )
    assert got == [0, 0, 0, 0, 0, 1, 1, 1, 1, 2, -1]
    assert edges == [-math.inf, 1.5, 3.0, math.inf]


X_SUP = [0, 1, 2, 2, 3, 5, 6, 10, NAN, NAN]
Y_SUP = [0, 0, 1, 0, 1, 0, 1, 1, 1, 1]


def test_dt_cut(spark):
    got, _ = _bins(spark, _df(spark, X_SUP, Y_SUP), "dt", 4)
    assert got == [0, 0, 1, 1, 1, 2, 3, 3, -1, -1]


def test_lgb_cut(spark):
    got, _ = _bins(spark, _df(spark, X_SUP, Y_SUP), "lgb", 4)
    assert got == [0, 1, 1, 1, 2, 2, 2, 3, -1, -1]


def test_chi_square_cut(spark):
    got, edges = _bins(spark, _df(spark, X_SUP, Y_SUP), "chi", 4)
    assert got == [0, 0, 1, 1, 1, 2, 3, 3, -1, -1]
    assert edges == [-math.inf, 1.0, 3.0, 5.0, math.inf]


def test_cut_with_edges(spark):
    edges = [-math.inf, 2.5, 5.0, 7.5, math.inf]
    df = _df(spark, [0, 4, 11, NAN]).withColumn(
        "__id", F.monotonically_increasing_id()
    )
    got = (
        cut_with_edges(df, "x", edges).orderBy("__id").toPandas()["x_bin"].tolist()
    )
    assert got == [0, 1, 3, -1]
    # finite outer edges: out-of-range -> -1 (reference pd.cut NaN fill)
    got2 = (
        cut_with_edges(df, "x", [0.5, 2.5, 5.0], out_col="b2")
        .orderBy("__id")
        .toPandas()["b2"]
        .tolist()
    )
    assert got2 == [-1, 1, -1, -1]


def test_chi2_isf_matches_scipy_goldens():
    # scipy.stats.chi2.isf reference values
    for (p, df, expect) in [
        (0.1, 3, 6.251388631170325),
        (0.05, 1, 3.841458820694124),
        (0.1, 9, 14.683656573259837),
        (0.005, 29, 52.33562095057089),
    ]:
        # goldens are table values, good to ~1e-5; the merge-stop
        # comparison in ChiMerge is insensitive at that scale
        assert abs(chi2_isf(p, df) - expect) < 1e-4


@pytest.mark.parametrize("method", ["step", "quantile", "dt", "lgb", "chi"])
def test_larger_random_fit(spark, method):
    rng = np.random.RandomState(7)
    x = rng.exponential(2.0, 500)
    x[rng.rand(500) < 0.1] = np.nan
    y = (rng.rand(500) < 0.3).astype(int)
    df = _df(spark, x, y)
    b = Binner(method=method, n_bins=6).fit(df, "x", "target")
    out = b.transform(df, "x").toPandas()
    assert (out.loc[out["x"].isna(), "x_bin"] == -1).all()
    assert (out.loc[out["x"].notna(), "x_bin"] >= 0).all()
    assert out["x_bin"].max() <= 5


def test_supervised_gate_edges_golden(spark):
    """The driver-gate dt/lgb/chi oracles replay these exact edges as
    SQL literals — if a fit change moves them, fail HERE with a clear
    message (update both this golden and the SQL constants) instead of
    a bare hash mismatch at the gate."""
    import math

    from didtool_spark.plans.operator_queries import (
        CHI_GATE_EDGES,
        DT_GATE_EDGES,
        LGB_GATE_EDGES,
        _supervised_fit_input,
    )

    fit_df = _supervised_fit_input(spark)
    for method, want in (
        ("dt", DT_GATE_EDGES), ("lgb", LGB_GATE_EDGES), ("chi", CHI_GATE_EDGES)
    ):
        got = Binner(method=method, n_bins=6).fit(fit_df, "x", "y").edges
        assert got == [-math.inf, *want, math.inf], (
            f"{method} gate edges drifted: {got} — update "
            f"{method.upper()}_GATE_EDGES and its oracle SQL"
        )


def test_reference_named_cut_wrappers(spark):
    """didtool-parity wrappers (cut.py:15-433): same edges/codes as the
    Binner machinery, reference (codes, bins) contract preserved."""
    import pyspark.sql.functions as F

    from didtool_spark.operators.binning import (
        cut, cut_with_bins, quantile_cut, step_cut,
    )

    df = spark.range(200).select(
        (F.col("id") / 20.0).alias("x"),
        (F.col("id") % 2).cast("double").alias("y"),
    )
    out, bins = step_cut(df, "x", n_bins=4, return_bins=True)
    assert "x_bin" in out.columns and len(bins) == 5
    assert out.where(F.col("x_bin") < 0).count() == 0  # no NaN input
    # same result through the precomputed-bins entry point
    again = cut_with_bins(df, "x", bins)
    assert (
        out.select("x", "x_bin").exceptAll(again.select("x", "x_bin")).count()
        == 0
    )
    # quantile wrapper without return_bins -> bare DataFrame
    q = quantile_cut(df, "x", n_bins=4)
    assert q.select(F.countDistinct("x_bin")).first()[0] == 4
    # dispatcher with a supervised method
    sup, sbins = cut(df, "x", target="y", method="dt", n_bins=3,
                     return_bins=True)
    assert sup.where(F.col("x_bin") >= len(sbins) - 1).count() == 0


def test_logger_tees_stdout(tmp_path, capsys):
    from didtool_spark.functions.utils import Logger

    lg = Logger(str(tmp_path / "run.log"))
    lg.write("hello didtool\n")
    assert "hello didtool" in open(tmp_path / "run.log").read()
    assert "hello didtool" in capsys.readouterr().out
