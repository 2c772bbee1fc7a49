"""scd2_compress / snapshot_latest units: window-vs-bucketed strategy
equivalence (including keys whose activity skips whole buckets — the
empty-bucket carry case), pandas differentials, tombstone merge."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from didtool_spark.operators.scd import scd2_compress, snapshot_latest

T0 = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "event_id", "ts", "val"])
    )


def _rows(spec):
    """spec: list of (key, [(minute_offset, val), ...])"""
    out, eid = [], 0
    for key, seq in spec:
        for minutes, val in seq:
            out.append((key, eid, T0 + dt.timedelta(minutes=minutes), val))
            eid += 1
    return out


FIXTURE = _rows(
    [
        ("a", [(0, "x"), (1, "x"), (2, "y"), (3, "y"), (4, "x")]),
        # key b: a run that spans a long silent gap — with small
        # buckets the gap covers several completely empty buckets
        ("b", [(0, "x"), (500, "x"), (1000, "y")]),
        ("c", [(0, None), (1, None), (2, "z"), (3, None)]),
        ("d", [(10, "only")]),
    ]
)


def _canon(df):
    pdf = df.toPandas()
    pdf = pdf.sort_values(["conv_id", "valid_from"]).reset_index(drop=True)
    return pdf[["conv_id", "val", "valid_from", "valid_to", "n_rows"]]


def test_scd2_window_semantics(spark):
    out = _canon(
        scd2_compress(
            _mk(spark, FIXTURE), "val", keys="conv_id",
            order=("ts", "event_id"),
        )
    )
    a = out[out.conv_id == "a"]
    assert list(a.val) == ["x", "y", "x"]
    assert list(a.n_rows) == [2, 2, 1]
    # half-open chain: valid_to of run i == valid_from of run i+1
    assert list(a.valid_to)[:-1] == list(a.valid_from)[1:]
    assert pd.isna(a.valid_to.iloc[-1])
    # NULL values form runs too (null-safe comparison)
    c = out[out.conv_id == "c"]
    assert list(c.val) == [None, "z", None]
    assert list(c.n_rows) == [2, 1, 1]
    d = out[out.conv_id == "d"]
    assert len(d) == 1 and pd.isna(d.valid_to.iloc[0])


@pytest.mark.parametrize("bucket_seconds", [3600, 86400])
def test_scd2_bucketed_equivalence(spark, bucket_seconds):
    base = _mk(spark, FIXTURE)
    w = _canon(
        scd2_compress(base, "val", keys="conv_id", order=("ts", "event_id"))
    )
    b = _canon(
        scd2_compress(
            base, "val", keys="conv_id", order=("ts", "event_id"),
            strategy="bucketed", bucket_seconds=bucket_seconds,
        )
    )
    pd.testing.assert_frame_equal(w, b)


def test_scd2_bucketed_equivalence_on_events(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = scd2_compress(
        ev, "event_type", keys="user_id", order=("ts", "event_id")
    ).toPandas()
    b = scd2_compress(
        ev, "event_type", keys="user_id", order=("ts", "event_id"),
        strategy="bucketed", bucket_seconds=86400,
    ).toPandas()
    key = ["user_id", "valid_from"]
    w = w.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(w, b[w.columns])


def test_scd2_rejects_unknown_strategy(spark):
    with pytest.raises(ValueError):
        scd2_compress(_mk(spark, FIXTURE), "val", strategy="nope")


def test_snapshot_latest_basic(spark):
    df = _mk(spark, FIXTURE)
    out = snapshot_latest(
        df, keys="conv_id", order=("ts", "event_id")
    ).toPandas()
    assert len(out) == 4
    got = dict(zip(out.conv_id, out.val))
    assert got == {"a": "x", "b": "y", "c": None, "d": "only"}
    # column order preserved
    assert list(out.columns) == ["conv_id", "event_id", "ts", "val"]


def test_snapshot_latest_tombstones(spark):
    rows = [
        ("a", 0, T0, "x", False),
        ("a", 1, T0 + dt.timedelta(1), "y", True),  # latest = delete
        ("b", 2, T0, "z", True),
        ("b", 3, T0 + dt.timedelta(1), "w", False),  # resurrected
        ("c", 4, T0, "k", None),  # NULL tombstone flag = keep
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "event_id", "ts", "val", "del"])
    )
    out = snapshot_latest(
        df, keys="k", order=("ts", "event_id"), delete_col="del"
    ).toPandas()
    got = dict(zip(out.k, out.val))
    assert got == {"b": "w", "c": "k"}
