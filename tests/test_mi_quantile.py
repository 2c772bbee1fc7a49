"""Units for mi.py: mutual-information scores vs a hand/numpy oracle,
the Acklam probit vs literature values, and the grid-based quantile
transform vs numpy's exact empirical CDF."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from didtool_spark.operators.mi import (
    mi_scores,
    probit_expr,
    probit_sql,
    quantile_transform,
)


def _mi_numpy(xs, ys):
    n = len(xs)
    from collections import Counter

    joint = Counter(zip(xs, ys))
    px = Counter(xs)
    py = Counter(ys)
    return sum(
        (nxy / n) * math.log(nxy * n / (px[x] * py[y]))
        for (x, y), nxy in joint.items()
    )


def test_mi_scores_matches_numpy(spark):
    rng = np.random.default_rng(17)
    y = rng.integers(0, 3, 300)
    informative = [f"c{v}" if rng.random() < 0.8 else "c9" for v in y]
    noise = [f"n{v}" for v in rng.integers(0, 4, 300)]
    rows = [(a, b, int(t)) for a, b, t in zip(informative, noise, y)]
    df = spark.createDataFrame(rows, "f1 string, f2 string, y int")
    got = {r["feature"]: r["mi"] for r in mi_scores(df, ["f1", "f2"]).collect()}
    ys = [str(t) for t in y]
    assert abs(got["f1"] - _mi_numpy(informative, ys)) < 1e-9
    assert abs(got["f2"] - _mi_numpy(noise, ys)) < 1e-9
    assert got["f1"] > got["f2"]  # informative ranks above noise


def test_mi_null_value_is_a_level_null_target_drops(spark):
    rows = [(None, 0), ("a", 0), ("a", 1), (None, 1), ("b", None)]
    df = spark.createDataFrame(rows, "f string, y int")
    got = mi_scores(df, ["f"]).collect()[0]["mi"]
    xs = ["<N>", "a", "a", "<N>"]  # the y-NULL row dropped
    ys = ["0", "0", "1", "1"]
    assert abs(got - _mi_numpy(xs, ys)) < 1e-12


def test_probit_literature_values(spark):
    pts = [(0.5, 0.0), (0.975, 1.959964), (0.025, -1.959964),
           (0.001, -3.090232), (0.999, 3.090232), (0.8413447461, 1.0)]
    df = spark.createDataFrame([(p,) for p, _ in pts], "p double")
    got = {r["p"]: r["z"] for r in
           df.select("p", probit_expr(F.col("p")).alias("z")).collect()}
    for p, z in pts:
        assert abs(got[p] - z) < 5e-6, p
    # out-of-domain -> NULL
    dom = spark.createDataFrame([(0.0,), (1.0,), (None,)], "p double")
    assert all(
        r["z"] is None
        for r in dom.select(probit_expr(F.col("p")).alias("z")).collect()
    )


def test_probit_sql_matches_expr(spark):
    import duckdb

    ps = [0.001, 0.02, 0.024, 0.0245, 0.3, 0.5, 0.7, 0.976, 0.999]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    se = {r["p"]: r["z"] for r in
          df.select("p", probit_expr(F.col("p")).alias("z")).collect()}
    sql = (
        f"SELECT p, {probit_sql('p')} AS z "
        f"FROM (SELECT CAST(unnest({ps!r}) AS DOUBLE) AS p)"
    )
    for p, z in duckdb.sql(sql).fetchall():
        assert abs(se[p] - z) < 1e-12, p


def test_quantile_transform_uniform_matches_empirical_cdf(spark):
    rng = np.random.default_rng(23)
    vals = np.sort(rng.exponential(5, 400))
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, x double"
    )
    B = 50
    out = {r["i"]: r["x_q"] for r in
           quantile_transform(df, ["x"], n_quantiles=B).collect()}
    # exact percent-rank of each value (midpoint-free definition used
    # by the grid: fraction of mass strictly interpolated below)
    for i, v in enumerate(vals):
        exact = i / (len(vals) - 1)  # v == its own quantile at prob i/(n-1)
        assert abs(out[i] - exact) <= 1.0 / B + 1e-6, (i, out[i], exact)
    # monotone
    ranks = [out[i] for i in range(len(vals))]
    assert all(a <= b + 1e-12 for a, b in zip(ranks, ranks[1:]))


def test_quantile_transform_normal_and_nulls(spark):
    rng = np.random.default_rng(29)
    rows = [(i, float(v)) for i, v in enumerate(rng.normal(0, 1, 300))]
    rows.append((300, None))
    df = spark.createDataFrame(rows, "i long, x double")
    out = {r["i"]: r["x_q"] for r in
           quantile_transform(df, ["x"], n_quantiles=50, output="normal").collect()}
    assert out[300] is None  # NULL passes through, not probit(eps)
    zs = np.array([out[i] for i in range(300)])
    # normal output of normal input ~ identity (up to grid error)
    xs = np.array([v for _, v in rows[:300]])
    mask = (np.abs(xs) < 1.5)  # away from the clipped tails
    assert np.median(np.abs(zs[mask] - xs[mask])) < 0.15


def test_quantile_transform_constant_and_all_null(spark):
    df = spark.createDataFrame(
        [(1.0, None), (1.0, None), (1.0, None)], "c double, z double"
    )
    out = quantile_transform(df, ["c", "z"], n_quantiles=10).collect()
    assert all(r["c_q"] == 0.5 for r in out)
    assert all(r["z_q"] is None for r in out)


def test_quantile_apply_is_pure_expr(spark):
    import re

    from tests.test_plan_shape import plan_str

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    out = quantile_transform(df, ["x"], n_quantiles=20, output="normal")
    assert not re.findall(r"\(\d+\) Exchange", plan_str(out))