"""Golden tests ported from reference tests/transformer_test.py (WOE)
and tests/encoder_test.py. samples.csv is read from the read-only
reference checkout (test data, not code)."""

import math
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from didtool_spark.operators.woe import (
    LabelEncoder,
    SingleWOETransformer,
    WOEEncoder,
    WOETransformer,
)

SAMPLES = "/root/reference/tests/samples.csv"
needs_samples = pytest.mark.skipif(
    not os.path.exists(SAMPLES), reason="reference samples.csv not available"
)


@pytest.fixture(scope="module")
def samples(spark):
    pdf = pd.read_csv(SAMPLES)
    return spark.createDataFrame(pdf)


@needs_samples
def test_single_woe_transformer_continuous(spark, samples):
    t = SingleWOETransformer()
    t.fit(samples, "v1", "target", "v1")

    assert list(np.round(t.bins, 5)) == [
        -math.inf, 0.00455, 0.00485, 0.0072, 0.01415, 0.01485, 0.0212,
        0.02815, 0.03165, 0.04235, math.inf,
    ]
    expect = {
        -1: -1.0171553366121715, 0: -0.10844300821451114, 1: 2.825413861621392,
        2: 0.5741220630148971, 3: 2.621814906380153, 4: 3.924026150289502,
        5: 1.4391195005015018, 6: 2.7384024846317625, 7: 0.340507211833392,
        8: 2.1322666810614472, 9: -0.6403220411783341,
    }
    for k, v in expect.items():
        assert abs(t.woe_map.get(k, 0) - v) < 1e-6
    assert abs(t.var_iv - 1.878709) < 1e-6
    assert len(t.woe_df) == 11
    assert t.var_name == "v1"

    tdf = spark.createDataFrame(
        [(0.02,), (0.05,), (None,)], "v1 double"
    ).withColumn("__id", F.monotonically_increasing_id())
    res = t.transform(tdf, "v1").orderBy("__id").toPandas()["v1_woe"].tolist()
    assert abs(res[0] - 1.439120) < 1e-6
    assert abs(res[1] - (-0.640322)) < 1e-6
    assert abs(res[2] - (-1.017155)) < 1e-6


def test_single_woe_transformer_categorical(spark):
    df = spark.createDataFrame(
        [("heh", 1), ("哈哈", 0), (None, 1), ("1", 1)], "x string, y int"
    ).withColumn("__id", F.monotonically_increasing_id())
    t = SingleWOETransformer(is_continuous=False)
    t.fit(df, "x", "y", "Chinese")
    res = t.transform(df, "x").orderBy("__id").toPandas()["x_woe"].tolist()
    np.testing.assert_allclose(
        np.round(res, 8), [0.28768207, -1.79175947, -0.40546511, 0.28768207]
    )


def test_woe_transformer_mixed(spark):
    train = pd.DataFrame(
        {
            "v1": [0.02, 0.02, 0.1, np.nan],
            "v2": ["0.05", "1", "1", None],
            "v3": ["cc", None, "f", None],
            "v4": ["张三", None, "王五", "王五"],
            "label": [0, 1, 0, 1],
        }
    )
    test = pd.DataFrame(
        {
            "v1": [0.02, 0.05, 0.1, np.nan],
            "v2": ["0.02", "0.05", "1", None],
            "v3": ["a", "cc", "f", None],
            "v4": ["张三", "李四", "王五", None],
            "label": [0, 1, 0, 0],
        }
    )
    tr = spark.createDataFrame(train)
    te = spark.createDataFrame(test).withColumn("__id", F.monotonically_increasing_id())
    t = WOETransformer(features=["v1", "v2", "v3", "v4"])
    t.fit(tr, "label")
    res = t.transform(te).orderBy("__id").toPandas()

    np.testing.assert_array_equal(
        np.round(res["v1"].tolist(), 6), [0.0, 0.693147, -0.693147, 0.693147]
    )
    np.testing.assert_array_equal(
        np.round(res["v2"].tolist(), 6), [0.693147, -0.693147, 0.0, 0.693147]
    )
    np.testing.assert_array_equal(
        np.round(res["v3"].tolist(), 6), [1.386294, -1.386294, -1.386294, 1.386294]
    )
    np.testing.assert_array_equal(
        np.round(res["v4"].tolist(), 6), [-0.693147, 0.693147, 0.0, 0.693147]
    )


@needs_samples
def test_woe_encoder(spark, samples):
    enc = WOEEncoder().fit(samples, "v5", "target")
    expect = {0: -0.21690835519242824, 1: 0.48454658205632983}
    for k, v in expect.items():
        assert abs(enc.woe_map.get(float(k), enc.woe_map.get(k, 0)) - v) < 1e-6

    tdf = spark.createDataFrame([(0.0,), (1.0,), (-1.0,)], "v5 double").withColumn(
        "__id", F.monotonically_increasing_id()
    )
    res = enc.transform(tdf, "v5").orderBy("__id").toPandas()["v5_woe"].tolist()
    assert abs(res[0] - (-0.216908)) < 1e-6
    assert abs(res[1] - 0.484547) < 1e-6
    assert abs(res[2]) < 1e-12


@needs_samples
def test_woe_encoder_nan(spark):
    pdf = pd.read_csv(SAMPLES)
    pdf.loc[:99, "v5"] = np.nan
    df = spark.createDataFrame(pdf)
    enc = WOEEncoder().fit(df, "v5", "target")
    expect = {
        0.0: -0.2511705085616937, 1.0: 0.5387442239332461,
        "NA": 0.04152558412767761,
    }
    for k, v in expect.items():
        assert abs(enc.woe_map[k] - v) < 1e-6
    tdf = spark.createDataFrame(
        [(0.0,), (1.0,), (-1.0,), (None,)], "v5 double"
    ).withColumn("__id", F.monotonically_increasing_id())
    res = enc.transform(tdf, "v5").orderBy("__id").toPandas()["v5_woe"].tolist()
    np.testing.assert_allclose(
        res, [-0.251171, 0.538744, 0.0, 0.041526], atol=1e-6
    )


def test_label_encoder(spark):
    df = spark.createDataFrame(
        [(1.0,), (5.0,), (6.0,), (2.0,), (3.0,), (5.0,), (6.0,), (None,)], "x double"
    ).withColumn("__id", F.monotonically_increasing_id())
    enc = LabelEncoder(missing_value=-1).fit(df, "x")
    got = enc.transform(df, "x").orderBy("__id").toPandas()["x_code"].tolist()
    assert got == [0, 3, 4, 1, 2, 3, 4, -1]

    new = spark.createDataFrame(
        [(1.0,), (5.0,), (999.0,), (None,)], "x double"
    ).withColumn("__id", F.monotonically_increasing_id())
    got2 = enc.transform(new, "x").orderBy("__id").toPandas()["x_code"].tolist()
    assert got2 == [0, 3, -1, -1]
