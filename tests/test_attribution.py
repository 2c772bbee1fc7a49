"""attribute_touches units: hand-worked journeys per credit model,
credits-sum-to-1 property on real event data, lookback censoring,
unassigned-touch handling; weighted_sample: determinism, k bound,
weight proportionality, invalid-weight exclusion."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from didtool_spark.operators.attribution import attribute_touches
from didtool_spark.operators.profile import weighted_sample

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    )


JOURNEY = [
    # user 1: three touches then a purchase, then one touch after
    (1, 1, "view", T0),
    (2, 1, "click", T0 + dt.timedelta(minutes=1)),
    (3, 1, "view", T0 + dt.timedelta(minutes=2)),
    (4, 1, "purchase", T0 + dt.timedelta(minutes=3)),
    (5, 1, "view", T0 + dt.timedelta(minutes=4)),  # no later conversion
    # user 2: touch too long before the purchase (outside lookback)
    (6, 2, "view", T0),
    (7, 2, "purchase", T0 + dt.timedelta(days=30)),
]


def _run(spark, model, lookback_s=604800):
    out = attribute_touches(
        _ev(spark, JOURNEY),
        touch=F.col("event_type").isin("view", "click"),
        conversion=F.col("event_type") == "purchase",
        keys="user_id", ts_col="ts", order=("ts", "event_id"),
        lookback_s=lookback_s, model=model,
    ).toPandas().sort_values("event_id").reset_index(drop=True)
    return out


def test_attribution_linear(spark):
    out = _run(spark, "linear")
    j = out[out.event_id.isin([1, 2, 3])]
    assert (j.n_touches == 3).all()
    assert list(j.position) == [1, 2, 3]
    np.testing.assert_allclose(j.credit, [1 / 3] * 3)
    # post-conversion and out-of-lookback touches: no journey, 0 credit
    for eid in (5, 6):
        r = out[out.event_id == eid].iloc[0]
        assert pd.isna(r.conv_ts_s) and r.credit == 0.0
        assert pd.isna(r.n_touches)


@pytest.mark.parametrize(
    "model,expect",
    [
        ("last_touch", [0.0, 0.0, 1.0]),
        ("first_touch", [1.0, 0.0, 0.0]),
        ("position_based", [0.4, 0.2, 0.4]),
    ],
)
def test_attribution_models(spark, model, expect):
    out = _run(spark, model)
    j = out[out.event_id.isin([1, 2, 3])].sort_values("position")
    np.testing.assert_allclose(j.credit, expect)


def test_attribution_two_touch_ushape(spark):
    rows = [
        (1, 9, "view", T0),
        (2, 9, "click", T0 + dt.timedelta(minutes=1)),
        (3, 9, "purchase", T0 + dt.timedelta(minutes=2)),
    ]
    out = attribute_touches(
        _ev(spark, rows),
        touch=F.col("event_type").isin("view", "click"),
        conversion=F.col("event_type") == "purchase",
        model="position_based",
    ).toPandas()
    np.testing.assert_allclose(sorted(out.credit), [0.5, 0.5])


@pytest.mark.parametrize("model", ["last_touch", "first_touch", "linear",
                                   "position_based"])
def test_attribution_credits_sum_to_one(spark, model):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = attribute_touches(
        ev,
        touch=F.col("event_type").isin("view", "click"),
        conversion=F.col("event_type") == "purchase",
        model=model,
    )
    sums = (
        out.where(F.col("conv_ts_s").isNotNull())
        .groupBy("user_id", "conv_ts_s")
        .agg(F.sum("credit").alias("s"))
        .toPandas()
    )
    assert len(sums) > 0
    np.testing.assert_allclose(sums.s, 1.0, atol=1e-9)


def test_attribution_rejects_unknown_model(spark):
    with pytest.raises(ValueError):
        _run(spark, "nope")


def test_weighted_sample_bounds_and_determinism(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    a = weighted_sample(
        orders, "o_custkey", 3, "o_orderkey", "o_totalprice"
    ).toPandas()
    b = weighted_sample(
        orders.repartition(7), "o_custkey", 3, "o_orderkey", "o_totalprice"
    ).toPandas()
    # partition-layout independent
    assert sorted(a.o_orderkey) == sorted(b.o_orderkey)
    assert a.groupby("o_custkey").size().max() <= 3
    # a different seed draws a different sample
    c = weighted_sample(
        orders, "o_custkey", 3, "o_orderkey", "o_totalprice", seed=1
    ).toPandas()
    assert sorted(a.o_orderkey) != sorted(c.o_orderkey)


def test_weighted_sample_proportionality(spark):
    # one group, one heavy item among light ones: across seeds the
    # heavy item must be drawn far more often than any light one
    pdf = pd.DataFrame(
        {
            "g": 1,
            "id": range(50),
            "w": [100.0] + [1.0] * 49,
        }
    )
    df = spark.createDataFrame(pdf)
    hits = 0
    for seed in range(30):
        got = weighted_sample(df, "g", 1, "id", "w", seed=seed).toPandas()
        hits += int(got.id.iloc[0] == 0)
    # P(heavy) = 100/149 ~ 0.67; 30 trials, expect ~20, demand > 10
    assert hits > 10


def test_weighted_sample_drops_invalid_weights(spark):
    pdf = pd.DataFrame(
        {"g": 1, "id": [1, 2, 3, 4], "w": [0.0, -1.0, None, 2.0]}
    )
    out = weighted_sample(
        spark.createDataFrame(pdf), "g", 10, "id", "w"
    ).toPandas()
    assert list(out.id) == [4]
