"""Units for per-group logistic fitting (operators/group_models.py):
kernel == pure twin bit-identity, partitioning invariance, sane
separation, and a JVM-only scoring plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from didtool_spark.operators.group_models import (
    apply_group_models,
    fit_logistic_arrays,
    fit_logistic_per_group,
)
from didtool_spark.plans.demo_queries import _group_model_fit_rows


def _models_dict(mdf):
    return {
        r["g"]: (list(r["weights"]), r["bias"], r["n"])
        for r in mdf.collect()
    }


def test_kernel_fit_bit_identical_to_twin(spark):
    rows = _group_model_fit_rows()
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y int")
    got = _models_dict(
        fit_logistic_per_group(df, ["x1", "x2"], "y", group_cols="g")
    )
    for t in sorted({r[0] for r in rows}):
        X = [(r[1], r[2]) for r in rows if r[0] == t]
        y = [r[3] for r in rows if r[0] == t]
        w, b = fit_logistic_arrays(X, y)
        gw, gb, gn = got[t]
        assert gn == len(y)
        assert gw == w and gb == b, t  # bit-identical, not just close


def test_fit_partitioning_invariant(spark):
    rows = _group_model_fit_rows()
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y int")
    a = _models_dict(fit_logistic_per_group(df, ["x1", "x2"], "y", "g"))
    b = _models_dict(
        fit_logistic_per_group(df.repartition(7), ["x1", "x2"], "y", "g")
    )
    assert a == b


def test_fit_separates_and_null_rows_excluded(spark):
    # group "pos": y follows x1 > 0.5 exactly; one NULL-feature row and
    # one NULL-label row must not disturb the fit
    rows = [("pos", i / 100.0, 0.0, 1 if i > 50 else 0) for i in range(100)]
    rows += [("pos", None, 0.0, 1), ("pos", 0.9, 0.0, None)]
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y int")
    m = _models_dict(fit_logistic_per_group(df, ["x1", "x2"], "y", "g"))
    w, b, n = m["pos"]
    assert n == 100
    assert w[0] > 0  # separating direction learned
    lo = 1.0 / (1.0 + math.exp(-(b + w[0] * 0.1)))
    hi = 1.0 / (1.0 + math.exp(-(b + w[0] * 0.9)))
    assert lo < 0.2 < 0.8 < hi


def test_apply_is_jvm_only_and_left_join_nulls(spark):
    from tests.test_plan_shape import plan_str

    models = spark.createDataFrame(
        [("a", [2.0, -1.0], 0.5, 10)],
        "g string, weights array<double>, bias double, n bigint",
    )
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("zz", 1.0, 1.0)],
        "g string, x1 double, x2 double",
    )
    out = apply_group_models(df, models, ["x1", "x2"], group_cols="g")
    p = plan_str(out)
    assert "FlatMapGroupsInPandas" not in p and "PythonUDF" not in p
    assert "BroadcastHashJoin" in p
    got = {r["g"]: r["score"] for r in out.collect()}
    assert abs(got["a"] - 1.0 / (1.0 + math.exp(-1.5))) < 1e-12
    assert got["zz"] is None  # no model for the group


def test_apply_preserves_caller_columns_named_like_model_columns(spark):
    models = spark.createDataFrame(
        [("a", [1.0], 0.0, 5)],
        "g string, weights array<double>, bias double, n bigint",
    )
    df = spark.createDataFrame(
        [("a", 2.0, 99, "keep")],
        "g string, x1 double, n int, weights string",
    )
    out = apply_group_models(df, models, ["x1"], group_cols="g")
    row = out.collect()[0]
    assert row["n"] == 99 and row["weights"] == "keep"
    assert abs(row["score"] - 1.0 / (1.0 + math.exp(-2.0))) < 1e-12
