"""Golden tests ported from reference tests/transformer_test.py
(CategoryTransformer / OneHotTransformer / ListTransformer)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from didtool_spark.operators.category import (
    CategoryTransformer,
    ListTransformer,
    OneHotTransformer,
)


def _ordered(df, cols):
    return (
        df.withColumn("__id", F.monotonically_increasing_id())
        if "__id" not in df.columns
        else df
    )


def test_category_transformer(spark):
    pdf = pd.DataFrame(
        {
            "x1": [1, 2, 1, 2, 1, 7.3, 0, 0, 0, 0, np.nan],
            "x2": ["北京", "上海", "上海", "山东", "北京", "北京",
                   None, None, None, None, None],
            "x3": [None] * 11,
            "x4": [1] * 11,
        }
    )
    pdf["x3"] = pdf["x3"].astype("string")
    df = spark.createDataFrame(pdf).withColumn("__id", F.monotonically_increasing_id())

    ct = CategoryTransformer().fit(df, ["x1", "x2", "x3", "x4"], max_bins=64)
    got = ct.transform(df).orderBy("__id").toPandas()

    assert got["x1"].tolist() == [2, 3, 2, 3, 2, 4, 1, 1, 1, 1, 0]
    assert got["x2"].tolist() == [1, 2, 2, 3, 1, 1, 0, 0, 0, 0, 0]
    assert got["x3"].tolist() == [0] * 11
    assert got["x4"].tolist() == [1] * 11

    # encoder maps match reference df_encoder content
    assert ct.map_encoder["x1"] == {0.0: 1, 1.0: 2, 2.0: 3, 7.3: 4, "others": 4, "nan": 0}
    assert ct.map_encoder["x2"] == {"北京": 1, "上海": 2, "山东": 3, "others": 3, "nan": 0}
    assert ct.map_encoder["x3"] == {"others": 0, "nan": 0}
    assert ct.map_encoder["x4"] == {1: 1, "others": 1}

    test_pdf = pd.DataFrame(
        {
            "x1": [1, 2, 1, 0, np.nan],
            "x2": ["北京", "上海", "山东", None, None],
            "x3": [None] * 5,
            "x4": [1] * 5,
        }
    )
    test_pdf["x3"] = test_pdf["x3"].astype("string")
    tdf = spark.createDataFrame(test_pdf).withColumn(
        "__id", F.monotonically_increasing_id()
    )
    got2 = ct.transform(tdf).orderBy("__id").toPandas()
    assert got2["x1"].tolist() == [2, 3, 2, 1, 0]
    assert got2["x2"].tolist() == [1, 2, 3, 0, 0]
    assert got2["x3"].tolist() == [0] * 5
    assert got2["x4"].tolist() == [1] * 5


def test_onehot_transformer(spark):
    train = pd.DataFrame(
        {
            "x1": [1, 2, 1, 1, np.nan],
            "x2": ["河南省", None, "浙江省", "福建省", None],
        }
    )
    df = spark.createDataFrame(train).withColumn("__id", F.monotonically_increasing_id())
    oht = OneHotTransformer().fit(df, ["x1", "x2"])

    got = oht.transform(df.orderBy("__id")).toPandas()
    expect = {
        "x1_1.0": [1, 0, 1, 1, 0],
        "x1_2.0": [0, 1, 0, 0, 0],
        "x1_nan": [0, 0, 0, 0, 1],
        "x2_河南省": [1, 0, 0, 0, 0],
        "x2_nan": [0, 1, 0, 0, 1],
        "x2_浙江省": [0, 0, 1, 0, 0],
        "x2_福建省": [0, 0, 0, 1, 0],
    }
    for k, v in expect.items():
        assert got[k].tolist() == v, k

    test = pd.DataFrame(
        {
            "x1": [1, 2, 2, np.nan],
            "x2": ["河南省", "湖南省", "北京市", None],
        }
    )
    tdf = spark.createDataFrame(test).withColumn("__id", F.monotonically_increasing_id())
    got2 = oht.transform(tdf.orderBy("__id")).toPandas()
    expect2 = {
        "x1_1.0": [1, 0, 0, 0],
        "x1_2.0": [0, 1, 1, 0],
        "x1_nan": [0, 0, 0, 1],
        "x2_河南省": [1, 0, 0, 0],
        "x2_nan": [0, 0, 0, 1],
        "x2_浙江省": [0, 0, 0, 0],
        "x2_福建省": [0, 0, 0, 0],
        "x2_others": [0, 1, 1, 0],
    }
    for k, v in expect2.items():
        assert got2[k].tolist() == v, k


def test_list_transformer(spark):
    train = spark.createDataFrame(
        [("1,2,5", "a,c"), ("2,3,4", "a,b"), ("2,4,5", "b"), (None, "a")],
        "x1 string, x2 string",
    ).withColumn("__id", F.monotonically_increasing_id())
    t = ListTransformer().fit(train, ["x1", "x2"])
    got = t.transform(train.orderBy("__id")).toPandas()

    assert list(got.columns) == [
        "x1_1", "x1_2", "x1_3", "x1_4", "x1_5", "x2_a", "x2_b", "x2_c",
    ]
    expect = pd.DataFrame(
        {
            "x1_1": [1, 0, 0, np.nan],
            "x1_2": [1, 1, 1, np.nan],
            "x1_3": [0, 1, 0, np.nan],
            "x1_4": [0, 1, 1, np.nan],
            "x1_5": [1, 0, 1, np.nan],
            "x2_a": [1, 1, 0, 1],
            "x2_b": [0, 1, 1, 0],
            "x2_c": [1, 0, 0, 0],
        }
    )
    for c in expect.columns:
        np.testing.assert_allclose(
            got[c].astype(float).values, expect[c].values, equal_nan=True
        )

    test = spark.createDataFrame(
        [(None, "a,c,d"), ("1,2,6", None)], "x1 string, x2 string"
    ).withColumn("__id", F.monotonically_increasing_id())
    got2 = t.transform(test.orderBy("__id")).toPandas()
    expect2 = pd.DataFrame(
        {
            "x1_1": [np.nan, 1], "x1_2": [np.nan, 1], "x1_3": [np.nan, 0],
            "x1_4": [np.nan, 0], "x1_5": [np.nan, 0],
            "x2_a": [1, np.nan], "x2_b": [0, np.nan], "x2_c": [1, np.nan],
        }
    )
    for c in expect2.columns:
        np.testing.assert_allclose(
            got2[c].astype(float).values, expect2[c].values, equal_nan=True
        )


def test_list_transformer_sub_sep(spark):
    train = spark.createDataFrame(
        [
            ("1:0.9,2:0.85,4:0.8", "a:0.11,c:0.22"),
            ("2:0.7,3:0.6,4:0.5", "a:0.33,b:0.44"),
            ("2:0.4,4:0.3", "b:0.99"),
            (None, "a:0.55"),
        ],
        "x1 string, x2 string",
    ).withColumn("__id", F.monotonically_increasing_id())
    t = ListTransformer(sub_sep=":").fit(train, ["x1", "x2"])
    got = t.transform(train.orderBy("__id")).toPandas()
    expect = pd.DataFrame(
        {
            "x1_1": [0.9, 0, 0, np.nan],
            "x1_2": [0.85, 0.7, 0.4, np.nan],
            "x1_3": [0, 0.6, 0, np.nan],
            "x1_4": [0.8, 0.5, 0.3, np.nan],
            "x2_a": [0.11, 0.33, 0, 0.55],
            "x2_b": [0, 0.44, 0.99, 0],
            "x2_c": [0.22, 0, 0, 0],
        }
    )
    for c in expect.columns:
        np.testing.assert_allclose(
            got[c].astype(float).values, expect[c].values, equal_nan=True
        )

    test = spark.createDataFrame(
        [(None, "a:0.66,c:0.77,d:0.88"), ("1:0.25,2:0.35,6:0.45", None)],
        "x1 string, x2 string",
    ).withColumn("__id", F.monotonically_increasing_id())
    got2 = t.transform(test.orderBy("__id")).toPandas()
    expect2 = pd.DataFrame(
        {
            "x1_1": [np.nan, 0.25], "x1_2": [np.nan, 0.35],
            "x1_3": [np.nan, 0], "x1_4": [np.nan, 0],
            "x2_a": [0.66, np.nan], "x2_b": [0, np.nan], "x2_c": [0.77, np.nan],
        }
    )
    for c in expect2.columns:
        np.testing.assert_allclose(
            got2[c].astype(float).values, expect2[c].values, equal_nan=True
        )
