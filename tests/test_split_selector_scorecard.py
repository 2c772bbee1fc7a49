"""Golden tests ported from reference tests/split_test.py,
tests/selector_test.py, tests/scorecard_test.py."""

import os
import random

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from didtool_spark.operators.scorecard import ScoreCardTransformer
from didtool_spark.operators.selector import Selector
from didtool_spark.operators.split import split_data, split_data_random, split_data_stacking

SAMPLES = "/root/reference/tests/samples.csv"
needs_samples = pytest.mark.skipif(
    not os.path.exists(SAMPLES), reason="reference samples.csv not available"
)


@pytest.fixture(scope="module")
def samples(spark):
    pdf = pd.read_csv(SAMPLES)
    pdf["idx"] = range(len(pdf))
    return spark.createDataFrame(pdf)


# ------------------------------------------------------------------ split

@needs_samples
def test_split_data(samples):
    got = split_data(samples, F.col("idx") < 500, F.col("idx") >= 750)
    counts = {r["group"]: r["count"] for r in got.groupBy("group").count().collect()}
    assert counts == {0: 500, 1: 250, -1: 250}


@needs_samples
def test_split_data_random_proportions(samples):
    # deterministic hash split: exact proportions in expectation
    # (documented divergence from sklearn's exact-count shuffle)
    got = split_data_random(samples, 0.6, 0.2, key_cols=["idx"])
    counts = {r["group"]: r["count"] for r in got.groupBy("group").count().collect()}
    n = sum(counts.values())
    assert n == 1000
    assert abs(counts[0] / n - 0.6) < 0.05
    assert abs(counts[1] / n - 0.2) < 0.04
    assert abs(counts[-1] / n - 0.2) < 0.04
    # reproducible under repartitioning
    again = split_data_random(samples.repartition(13), 0.6, 0.2, key_cols=["idx"])
    a = got.select("idx", "group").toPandas().sort_values("idx")
    b = again.select("idx", "group").toPandas().sort_values("idx")
    assert (a["group"].values == b["group"].values).all()


@needs_samples
def test_split_data_stacking(samples):
    got = split_data_stacking(samples, F.col("idx") >= 900, 3, key_cols=["idx"])
    counts = {r["group"]: r["count"] for r in got.groupBy("group").count().collect()}
    assert counts[-1] == 100
    assert sum(v for k, v in counts.items() if k >= 0) == 900
    for k in (0, 1, 2):
        assert abs(counts[k] - 300) < 60


# --------------------------------------------------------------- selector

def test_drop_missing(spark):
    pdf = pd.DataFrame(
        {
            "x1": list(range(10)) * 3,
            "x2": [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4] + [np.nan] * 15,
            "x3": [np.nan] * 30,
            "x4": [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4]
            + [np.nan] * 6 + [-1.0] * 6 + [9.0] * 3,
        }
    )
    df = spark.createDataFrame(pdf)
    sel = Selector(df).drop_missing(0.5, missing_value=-1)
    ms = sel.missing_stats["missing_rate"]
    assert abs(ms["x3"] - 1.0) < 1e-12
    assert abs(ms["x2"] - 0.5) < 1e-12
    assert abs(ms["x4"] - 0.4) < 1e-12
    assert abs(ms["x1"] - 0.0) < 1e-12
    assert sel.drop_cols == ["x3"]
    assert len(sel.df.columns) == 3


X1 = [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4,
      5, 5, 5, 6, 6, 6, 7, 7, 7, 8, 8, 8, 9, 9, 9,
      10, 10, 10, 11, 11, 11, np.nan, np.nan, np.nan]
TARGET = [0, 0, 0, 0, 0, 1, 0, 1, 1, 1, 1, 1, 0, 0, 1,
          0, 0, 0, 0, 0, 1, 0, 1, 1, 1, 1, 1, 0, 0, 1,
          0, 0, 0, 0, 0, 1, 0, 1, 1]


def test_drop_low_iv(spark):
    pdf = pd.DataFrame(
        {
            "x1": X1,
            "x2": [v if not np.isnan(v) else -1 for v in X1],
            "x3": [0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0,
                   0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0,
                   0, 1, 0, 1, 0, 1, 1, 0, 1],
            "target": TARGET,
        }
    )
    df = spark.createDataFrame(pdf)
    sel = Selector(df, "target", categorical_cols=["x2"]).drop_low_iv(0.5)
    assert abs(sel.iv_stats.loc["x1", "iv"] - 1.405716) < 1e-6
    assert abs(sel.iv_stats.loc["x2", "iv"] - 1.398188) < 1e-6
    assert abs(sel.iv_stats.loc["x3", "iv"] - 0.129772) < 1e-6
    assert sel.drop_cols == ["x3"]
    assert len(sel.df.columns) == 3  # x1, x2, target


def test_drop_correlated(spark):
    x0 = [12, 12, 12, 11, 11, 11, 10, 10, 10, 9, 9, 9,
          8, 8, 8, 7, 7, 7, 6, 6, 6, 5, 5, 5, 4, 4, 4,
          3, 3, 3, 2, 2, 2, 1, 1, 1, 0, 0, 0]
    x3 = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
          12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0,
          0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
    pdf = pd.DataFrame(
        {"x0": x0, "x1": X1, "x2": x0, "x3": x3, "target": TARGET}
    )
    df = spark.createDataFrame(pdf)
    sel = Selector(df, "target").drop_correlated(0.5)
    assert abs(sel.iv_stats.loc["x0", "iv"] - 1.455369) < 1e-6
    assert abs(sel.iv_stats.loc["x1", "iv"] - 1.405716) < 1e-6
    assert abs(sel.iv_stats.loc["x2", "iv"] - 1.455369) < 1e-6
    assert abs(sel.iv_stats.loc["x3", "iv"] - 0.929362) < 1e-6
    assert abs(sel.corr_matrix.loc["x0", "x2"] - 1) < 1e-12
    assert abs(sel.corr_matrix.loc["x1", "x2"] - (-1)) < 1e-12
    assert abs(sel.corr_matrix.loc["x1", "x3"] - (-0.0887)) < 1e-4
    assert sel.drop_cols == ["x1", "x2"]
    assert len(sel.df.columns) == 3  # x0, x3, target


# -------------------------------------------------------------- scorecard

@needs_samples
def test_scorecard_golden(spark):
    pdf = pd.read_csv(SAMPLES)[["target"]]
    random.seed(1)
    pdf["prob"] = pdf["target"].apply(
        lambda x: random.uniform(0, 0.8) if x < 1 else random.uniform(0.2, 1)
    )
    df = spark.createDataFrame(pdf)
    t = ScoreCardTransformer(bad_flag=True).fit(df, "prob", "target")

    tdf = spark.createDataFrame(
        [(0.05,), (0.5,), (0.8,)], "prob double"
    ).withColumn("__id", F.monotonically_increasing_id())
    scores = t.transform(tdf, "prob").orderBy("__id").toPandas()["score"].tolist()
    assert scores == [815, 677, 666]

    assert abs(t.mapping_df["slope"][1] - (-400)) < 1e-6
    assert abs(t.mapping_df["intercept"][1] - 835) < 1e-6
    assert int(t.mapping_df["slope"][1] * 0.05 + t.mapping_df["intercept"][1]) == 815


def test_drop_low_importance(spark):
    """Reference selector.py:194-283 semantics (exercised by reference
    tests/selector_test.py:94-95): noise features fall past the
    cumulative-importance cut, signal features survive. Runs on the
    numpy GBM fallback here (no lightgbm in this container); the
    lightgbm path follows the reference hyperparameters verbatim."""
    import numpy as np
    from didtool_spark.operators.selector import Selector

    rng = np.random.RandomState(0)
    n = 3000
    x_sig = rng.rand(n)
    x_sig2 = rng.rand(n)
    noise = rng.rand(n, 3)
    y = ((x_sig * 0.8 + x_sig2 * 0.5 + rng.rand(n) * 0.05) > 0.65).astype(int)
    rows = [
        (float(x_sig[i]), float(x_sig2[i]), float(noise[i, 0]),
         float(noise[i, 1]), float(noise[i, 2]), int(y[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "x_sig double, x_sig2 double, n1 double, n2 double, n3 double, y int"
    )
    sel = Selector(df, "y").drop_low_importance(
        cumulative_importance=0.9, run_times=3, n_trees=25
    )
    kept = [c for c in sel.df.columns if c != "y"]
    assert "x_sig" in kept
    assert len(sel.drop_cols) >= 1  # some noise dropped
    st = sel.importance_stats
    # signals outrank every noise feature
    order = list(st["feature"])
    assert max(order.index("x_sig"), order.index("x_sig2")) < min(
        order.index("n1"), order.index("n2"), order.index("n3")
    )
    assert list(st["cumulative"].round(9)) == sorted(st["cumulative"].round(9))
    assert abs(st["normalized"].sum() - 1.0) < 1e-9


def test_drop_low_importance_sampled(spark):
    """sample_limit bounds the driver-side frame."""
    import numpy as np
    from didtool_spark.operators.selector import Selector

    rng = np.random.RandomState(1)
    rows = [
        (float(v), float(w), int(v > 0.5))
        for v, w in zip(rng.rand(4000), rng.rand(4000))
    ]
    df = spark.createDataFrame(rows, "x double, noise double, y int")
    sel = Selector(df, "y")
    pdf = sel._sample_pandas(["x", "noise"], sample_limit=500)
    assert len(pdf) < 1200  # fraction sampling, not full collect
    sel.drop_low_importance(run_times=1, sample_limit=500, n_trees=10)
    # a perfect single predictor is the reference's degenerate edge: its
    # own cumulative hits 1.0 > threshold so the literal cut drops it
    # too — assert the ranking and that the cut ran, not survival
    st = sel.importance_stats
    assert list(st["feature"]) == ["x", "noise"]
    assert "noise" in sel.drop_cols


def test_scorecard_gate_input_adjustment_noop(spark):
    """The SQL_SCORECARD oracle replays fit+transform WITHOUT the
    sequential odds adjustment — valid only while the gate input keeps
    every bin dual-class. Assert the no-op explicitly so an input/data
    change fails here with a message, not as a bare gate hash mismatch."""
    import numpy as np

    from didtool_spark.operators.scorecard import ScoreCardTransformer
    from didtool_spark.plans.operator_queries import _scorecard_input

    ev = _scorecard_input(spark, "/root/testdata/sf0.001")
    t = ScoreCardTransformer(bad_flag=True).fit(ev, "prob", "y")
    b = t.binning_df
    assert (b["good_hits"] > 0).all() and (b["bad_hits"] > 0).all(), (
        "scorecard gate input no longer dual-class in every bin — "
        "SQL_SCORECARD's no-adjustment replay is invalid"
    )
    np.testing.assert_array_equal(b["odds"].values, b["adjusted_odds"].values)
