"""Differential binning tests: the engine's edges/bin-ids vs the exact
pandas primitives the reference is built on (cut.py:43-104 uses pd.cut /
pd.qcut directly). Hypothesis drives the input space; NaNs included."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from didtool_spark.operators.binning import Binner, cut_with_edges

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)
arrays = st.lists(
    st.one_of(finite, st.just(float("nan"))), min_size=5, max_size=40
).filter(lambda xs: len({x for x in xs if not math.isnan(x)}) >= 2)


def reference_step_cut(x, n_bins):
    """cut.py:43-61 logic verbatim on pandas."""
    out, bins = pd.cut(x, n_bins, labels=False, retbins=True)
    cut_bins = []
    unique_bins = np.sort(np.unique(out[~np.isnan(out)])) if np.ndim(out) else []
    for i in range(1, n_bins):
        if i in unique_bins:
            cut_bins.append(bins[i])
    cut_bins = [-np.inf] + cut_bins + [np.inf]
    out, _ = pd.cut(x, cut_bins, labels=False, retbins=True)
    out = np.where(np.isnan(out), -1, out).astype(int)
    return list(out), cut_bins


def reference_quantile_cut(x, n_bins):
    """cut.py:94-104 logic verbatim on pandas."""
    out, bins = pd.qcut(x, n_bins, labels=False, retbins=True, duplicates="drop")
    out = np.where(np.isnan(out), -1, out).astype(int)
    bins = bins.astype(float)
    bins[0] = -np.inf
    bins[-1] = np.inf
    return list(out), list(bins)


@pytest.fixture(scope="module")
def mk_df(spark):
    from pyspark.sql import functions as F

    def _mk(xs):
        df = spark.createDataFrame(
            [(float(i), None if math.isnan(v) else float(v)) for i, v in enumerate(xs)],
            "i double, x double",
        )
        return df

    return _mk


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(xs=arrays, n_bins=st.integers(2, 8))
def test_step_cut_matches_pandas(mk_df, xs, n_bins):
    df = mk_df(xs)
    b = Binner(method="step", n_bins=n_bins).fit(df, "x")
    got = (
        b.transform(df, "x").orderBy("i").toPandas()["x_bin"].tolist()
    )
    expect, exp_bins = reference_step_cut(np.array(xs), n_bins)
    assert got == expect, (xs, n_bins, b.edges, exp_bins)
    np.testing.assert_allclose(b.edges, exp_bins, rtol=1e-12)


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(xs=arrays, n_bins=st.integers(2, 8))
def test_quantile_cut_matches_pandas(mk_df, xs, n_bins):
    df = mk_df(xs)
    b = Binner(method="quantile", n_bins=n_bins).fit(df, "x")
    got = b.transform(df, "x").orderBy("i").toPandas()["x_bin"].tolist()
    expect, exp_bins = reference_quantile_cut(np.array(xs), n_bins)
    assert got == expect, (xs, n_bins, b.edges, exp_bins)
    np.testing.assert_allclose(b.edges, exp_bins, rtol=1e-9)


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=arrays,
    edges=st.lists(finite, min_size=2, max_size=6, unique=True),
)
def test_cut_with_edges_matches_pandas(mk_df, xs, edges):
    edges = sorted(edges)
    df = mk_df(xs)
    got = (
        cut_with_edges(df, "x", edges).orderBy("i").toPandas()["x_bin"].tolist()
    )
    out = pd.cut(np.array(xs), edges, right=True, labels=False)
    expect = list(np.where(np.isnan(out), -1, out).astype(int))
    assert got == expect, (xs, edges)
