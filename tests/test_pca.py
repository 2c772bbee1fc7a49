"""pca_fit / pca_project / random_project units: numpy differential
for the distributed Gram fit, sign determinism, projection parity,
JL distance preservation on average."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from didtool_spark.operators.pca import (
    gate_projection_matrix,
    pca_fit,
    pca_project,
    random_project,
)

RNG = np.random.default_rng(3)


def _emb_df(spark, x):
    pdf = pd.DataFrame(
        {"i": range(len(x)), "v": [row.tolist() for row in x]}
    )
    return spark.createDataFrame(pdf), pdf


def test_pca_fit_matches_numpy(spark):
    # anisotropic data: two dominant directions
    n, dim = 300, 8
    basis = np.linalg.qr(RNG.normal(size=(dim, dim)))[0]
    scales = np.array([10, 5, 1, 0.5, 0.2, 0.1, 0.05, 0.02])
    x = RNG.normal(size=(n, dim)) * scales @ basis.T + RNG.normal(size=dim)
    df, _ = _emb_df(spark, x)
    # several partitions so the partial-Gram reduce is exercised
    model = pca_fit(df.repartition(5), "v", k=3)

    mean = x.mean(0)
    cov = np.cov(x.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    np.testing.assert_allclose(model.mean, mean, atol=1e-9)
    for j, i in enumerate(order):
        got = np.asarray(model.components[j])
        ref = vecs[:, i]
        # sign-insensitive direction match
        assert min(
            np.abs(got - ref).max(), np.abs(got + ref).max()
        ) < 1e-8
        # and the shipped sign rule: largest-|entry| coordinate positive
        assert got[np.argmax(np.abs(got))] > 0
        assert abs(model.explained_variance[j] - vals[i]) < 1e-8
    assert 0.9 < sum(model.explained_variance_ratio) <= 1.0 + 1e-12


def test_pca_project_parity(spark):
    n, dim = 50, 6
    x = RNG.normal(size=(n, dim))
    df, _ = _emb_df(spark, x)
    model = pca_fit(df, "v", k=2)
    out = (
        pca_project(df, "v", model)
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    comps = np.asarray(model.components)
    ref = (x - np.asarray(model.mean)) @ comps.T
    np.testing.assert_allclose(
        out[["pc0", "pc1"]].to_numpy(), ref, atol=1e-9
    )
    # projections of centered data have ~zero mean
    assert abs(out.pc0.mean()) < 1e-9


def test_random_project_preserves_distances_on_average(spark):
    n, dim, k = 80, 64, 16
    x = RNG.normal(size=(n, dim)).astype(np.float64)
    df, _ = _emb_df(spark, x)
    mat = [
        [float(v) for v in row]
        for row in np.random.RandomState(5).standard_normal((k, dim))
    ]
    out = (
        random_project(df, "v", mat, prefix="rp")
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    y = out[[f"rp{j}" for j in range(k)]].to_numpy()
    # parity with numpy
    ref = x @ np.asarray(mat).T / np.sqrt(k)
    np.testing.assert_allclose(y, ref, atol=1e-9)
    # JL: squared distances preserved within a loose factor on average
    d_x = np.sum((x[:40, None] - x[None, 40:]) ** 2, -1).ravel()
    d_y = np.sum((y[:40, None] - y[None, 40:]) ** 2, -1).ravel()
    ratio = d_y / d_x
    assert 0.8 < ratio.mean() < 1.2


def test_gate_matrix_is_stable(spark):
    a = gate_projection_matrix(4, 64)
    b = gate_projection_matrix(4, 64)
    assert a == b
    assert len(a) == 4 and len(a[0]) == 64


def test_pca_fit_float32_input(spark):
    x = RNG.normal(size=(40, 4)).astype(np.float32)
    pdf = pd.DataFrame({"v": [row.tolist() for row in x]})
    df = spark.createDataFrame(pdf).withColumn(
        "v", F.col("v").cast("array<float>")
    )
    model = pca_fit(df, "v", k=2)
    assert len(model.components[0]) == 4


def test_pca_fit_null_elements_clear_diagnostic(spark):
    # ADVICE r4: a vector containing NULL elements stacks to an object
    # ndarray whose astype raises an opaque TypeError — the operator
    # must surface a clear message instead
    import pytest

    pdf = pd.DataFrame({"v": [[1.0, 2.0], [3.0, None], [5.0, 6.0]]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="NULL or NaN"):
        pca_fit(df, "v", k=1)
