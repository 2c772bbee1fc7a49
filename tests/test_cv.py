"""Units for the temporal CV splits: leakage invariants and numpy
fold-edge parity."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from didtool_spark.operators.cv import purged_kfold, rolling_origin_folds

T0 = dt.datetime(2024, 1, 1)


def _df(spark, secs):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=float(s))) for i, s in enumerate(secs)],
        "i long, ts timestamp",
    )


def test_rolling_origin_balanced_and_ordered(spark):
    rng = np.random.default_rng(3)
    secs = rng.uniform(0, 1e6, 500)
    out = rolling_origin_folds(_df(spark, secs), n_folds=5).collect()
    segs = {r["i"]: r["segment"] for r in out}
    # equal-count cuts: each segment within 2 rows of 100
    from collections import Counter

    c = Counter(segs.values())
    assert set(c) == {0, 1, 2, 3, 4}
    assert all(abs(n - 100) <= 2 for n in c.values()), c
    # temporal order: every row of segment k is earlier than every row
    # of segment k+1 (the leakage invariant)
    by_seg = {}
    for i, s in segs.items():
        by_seg.setdefault(s, []).append(secs[i])
    for k in range(4):
        assert max(by_seg[k]) <= min(by_seg[k + 1])
    # min_train_folds: segment 0 is never a test fold
    tf = {r["i"]: r["test_fold"] for r in out}
    assert all(tf[i] is None for i, s in segs.items() if s == 0)
    assert all(tf[i] == s for i, s in segs.items() if s >= 1)


def test_purged_kfold_embargo_invariants(spark):
    secs = np.arange(0, 3000, 10.0)  # uniform 10s grid
    df = _df(spark, secs)
    out = purged_kfold(df, n_folds=3, ts_col="ts", embargo_s=100.0).collect()
    rows = {r["i"]: r for r in out}
    folds = {i: r["fold"] for i, r in rows.items()}
    # never train on your own test fold
    for i, r in rows.items():
        assert not r[f"train_{r['fold']}"], i
    # embargo actually removes rows: train_k count < rows outside fold k
    for k in range(3):
        outside = sum(1 for r in rows.values() if r["fold"] != k)
        trainable = sum(1 for r in rows.values() if r[f"train_{k}"])
        assert trainable < outside, k       # embargo purged something
        assert trainable > outside - 50, k  # ...but only near boundaries
    # zero embargo -> trainable == outside
    out0 = purged_kfold(df, n_folds=3, ts_col="ts", embargo_s=0.0).collect()
    for k in range(3):
        outside = sum(1 for r in out0 if r["fold"] != k)
        trainable = sum(1 for r in out0 if r[f"train_{k}"])
        assert trainable == outside, k


def test_cv_pure_expression_plan(spark):
    import re

    from tests.test_plan_shape import plan_str

    df = _df(spark, np.arange(100.0))
    out = rolling_origin_folds(df, n_folds=4)
    p = plan_str(out)
    assert "PythonUDF" not in p
    assert not re.findall(r"\(\d+\) Exchange", p)
