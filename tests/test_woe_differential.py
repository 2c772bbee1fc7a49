"""Differential WOE/IV/PSI tests vs a pandas transcription of the
reference math (metric.py:17-83, encoder.py:27-52) under hypothesis —
the 0.5-floor edge cases (empty groups, single-class groups) are
exactly where naive implementations diverge."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from didtool_spark.operators.metrics import iv as spark_iv, psi as spark_psi
from didtool_spark.operators.woe import WOEEncoder

values = st.lists(
    st.one_of(st.integers(0, 4), st.just(None)), min_size=6, max_size=60
)
labels = st.lists(st.integers(0, 1), min_size=6, max_size=60)


def ref_probability(y, mask):
    """metric.py:17-49."""
    total_0 = max((y == 0).sum(), 0.5)
    total_1 = max((y == 1).sum(), 0.5)
    gy = y[mask]
    g0 = max((gy == 0).sum(), 0.5)
    g1 = max((gy == 1).sum(), 0.5)
    return g1 / total_1, g0 / total_0


def ref_iv_discrete(x, y):
    """metric.py:66-83 with 'nan' string for missing (utils.py:44-67)."""
    out = 0.0
    for v in set(x):
        p1, p0 = ref_probability(y, x == v)
        out += (p1 - p0) * math.log(p1 / p0)
    return out


@pytest.fixture(scope="module")
def mk(spark):
    def _mk(xs, ys):
        return spark.createDataFrame(
            [
                (float(i), None if x is None else int(x), int(t))
                for i, (x, t) in enumerate(zip(xs, ys))
            ],
            "i double, x int, y int",
        )

    return _mk


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(xs=values, ys=labels)
def test_iv_discrete_matches_reference_math(mk, xs, ys):
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    df = mk(xs, ys)
    got = spark_iv(df, "x", "y", is_continuous=False)
    # the engine may route to the continuous path when the distinct
    # ratio gate fires (metric.py:120); keep inputs below the gate
    x_str = np.array(["nan" if v is None else str(int(v)) for v in xs])
    y_arr = np.array(ys)
    if len(set(x_str)) / len(x_str) > 0.5:
        return  # continuous gate fires; covered by golden tests
    expect = ref_iv_discrete(x_str, y_arr)
    assert abs(got - expect) < 1e-9, (xs, ys)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(xs=values, ys=labels)
def test_woe_encoder_matches_reference_math(mk, xs, ys):
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    df = mk(xs, ys)
    enc = WOEEncoder().fit(df, "x", "y")
    y_arr = np.array(ys)
    x_arr = np.array([np.nan if v is None else float(v) for v in xs])
    for v in set(v for v in xs if v is not None):
        p1, p0 = ref_probability(y_arr, x_arr == v)
        assert abs(enc.woe_map[v] - math.log(p1 / p0)) < 1e-12
    if any(v is None for v in xs):
        p1, p0 = ref_probability(y_arr, np.isnan(x_arr))
        assert abs(enc.woe_map["NA"] - math.log(p1 / p0)) < 1e-12


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(e=st.lists(st.integers(0, 3), min_size=4, max_size=40),
       a=st.lists(st.integers(0, 3), min_size=4, max_size=40))
def test_psi_discrete_matches_reference_math(spark, e, a):
    edf = spark.createDataFrame([(int(v),) for v in e], "x int")
    adf = spark.createDataFrame([(int(v),) for v in a], "x int")
    got = spark_psi(edf, adf, "x", is_continuous=False)
    groups = sorted(set(e) | set(a))
    er = np.array([max((np.array(e) == g).mean(), 1e-10) for g in groups])
    ar = np.array([max((np.array(a) == g).mean(), 1e-10) for g in groups])
    expect = float(np.sum((ar - er) * np.log(ar / er)))
    assert abs(got - expect) < 1e-9
