"""with_future_label: hand oracle, strict-future (zero-leakage)
semantics, window ≡ bucketed equivalence on randomized fixtures, and
the single-exchange plan contract; transcript_parity: status
classification vs a hand oracle."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from didtool_spark.operators.labels import with_future_label
from didtool_spark.operators.parity import transcript_parity

T0 = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def _collect(df, cols):
    return {
        r["rid"]: tuple(r[c] for c in cols)
        for r in df.collect()
    }


def test_future_label_hand_oracle(spark):
    # conv A: events at t=0, 10, 100, 700; flag fires at t=100
    rows = [
        ("A", 0, _ts(0), 0, 1.0),
        ("A", 1, _ts(10), 0, 2.0),
        ("A", 2, _ts(100), 1, 4.0),
        ("A", 3, _ts(700), 0, 8.0),
        ("B", 4, _ts(0), 0, 1.5),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, rid int, ts timestamp, flag int, v double"
    )
    out = with_future_label(
        df, [("flag", "max", 600), ("v", "sum", 600)], keys="conv_id", fill=0
    )
    got = _collect(out, ["flag_max_next600s", "v_sum_next600s"])
    # t=0: future (0,600] holds t=10 (flag 0, v 2) and t=100 (flag 1, v 4)
    assert got[0] == (1, 6.0)
    # t=10: (10,610] holds t=100 only
    assert got[1] == (1, 4.0)
    # t=100: (100,700] holds t=700 (boundary inclusive)
    assert got[2] == (0, 8.0)
    # t=700: nothing ahead -> fill
    assert got[3] == (0, 0.0)
    # conv B isolated
    assert got[4] == (0, 0.0)


def test_future_label_never_reads_past_or_self(spark):
    """Leakage direction check: with include_current=False the label of
    the LAST row of every key is always the fill value, no matter what
    came before it — i.e. the frame is strictly future."""
    rows = [("K", i, _ts(i * 5), 1, 1.0) for i in range(50)]
    df = spark.createDataFrame(
        rows, "conv_id string, rid int, ts timestamp, flag int, v double"
    )
    out = with_future_label(df, [("flag", "max", 10_000)], fill=0)
    got = _collect(out, ["flag_max_next10000s"])
    assert got[49] == (0,)          # last row sees nothing
    assert all(got[i] == (1,) for i in range(49))


def _rand_events(seed: int, n_convs: int = 6, n_rows: int = 120):
    rng = random.Random(seed)
    rows = []
    for rid in range(n_rows):
        conv = f"c{rng.randrange(n_convs)}"
        # clustered timestamps with occasional ties and big gaps
        t = rng.choice([rng.uniform(0, 500), rng.uniform(0, 50_000)])
        rows.append(
            (conv, rid, _ts(int(t)), rng.randrange(2),
             round(rng.uniform(-5, 5), 3) if rng.random() > 0.1 else None)
        )
    return rows


def test_future_label_bucketed_equals_window(spark):
    for seed in (11, 12, 13):
        df = spark.createDataFrame(
            _rand_events(seed),
            "conv_id string, rid int, ts timestamp, flag int, v double",
        )
        specs = [("flag", "max", 300), ("v", "sum", 300), ("v", "count", 300)]
        a = with_future_label(df, specs, fill=None, strategy="window")
        b = with_future_label(
            df, specs, fill=None, strategy="bucketed", bucket_seconds=200
        )
        cols = ["flag_max_next300s", "v_sum_next300s", "v_count_next300s"]
        ga, gb = _collect(a, cols), _collect(b, cols)
        assert ga.keys() == gb.keys()
        for k in ga:
            for x, y in zip(ga[k], gb[k]):
                if x is None or y is None:
                    assert x == y, (seed, k, ga[k], gb[k])
                else:
                    assert abs(x - y) < 1e-9, (seed, k, ga[k], gb[k])


def test_future_label_single_exchange(spark):
    import re

    from tests.test_plan_shape import plan_str

    df = spark.createDataFrame(
        [("A", 0, _ts(0), 1, 1.0)],
        "conv_id string, rid int, ts timestamp, flag int, v double",
    )
    out = with_future_label(
        df, [("flag", "max", 600), ("v", "sum", 3600)], fill=0
    )
    p = plan_str(out)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


# ---------------------------------------------------------------- parity

def test_transcript_parity_statuses(spark):
    left = spark.createDataFrame(
        [("A", 0, "hi"), ("A", 1, "yo"), ("A", 2, "gone-right"),
         ("B", 0, "same")],
        "conv_id string, turn_idx int, text string",
    )
    right = spark.createDataFrame(
        [("A", 0, "hi"), ("A", 1, "DIFFERENT"), ("A", 3, "gone-left"),
         ("B", 0, "same")],
        "conv_id string, turn_idx int, text string",
    )
    got = {r["status"]: (r["n_turns"], r["n_convs"])
           for r in transcript_parity(left, right).collect()}
    assert got == {
        "match": (2, 2),        # (A,0) and (B,0)
        "diff": (1, 1),         # (A,1)
        "left_only": (1, 1),    # (A,2)
        "right_only": (1, 1),   # (A,3)
    }


def test_transcript_parity_detail_and_null_safety(spark):
    left = spark.createDataFrame(
        [("A", 0, None, "r1"), ("A", 1, "x", None)],
        "conv_id string, turn_idx int, text string, role string",
    )
    right = spark.createDataFrame(
        [("A", 0, None, "r1"), ("A", 1, "x", "changed")],
        "conv_id string, turn_idx int, text string, role string",
    )
    rows = {
        (r["conv_id"], r["turn_idx"]): (r["status"], list(r["diff_cols"]))
        for r in transcript_parity(
            left, right, compare_cols=("text", "role"), detail=True
        ).collect()
    }
    # NULL == NULL counts as a match (eqNullSafe)
    assert rows[("A", 0)] == ("match", [])
    assert rows[("A", 1)] == ("diff", ["role"])


# -------------------------------------------------------- with_time_to_event

from didtool_spark.operators.labels import with_time_to_event


def test_time_to_event_hand_fixture(spark):
    rows = [
        # (key, t, is_event)
        ("u", 0.0, 0),
        ("u", 10.0, 1),    # anchor 0 -> tte 10
        ("u", 10.0, 0),    # same-second row: frame starts at +1s
        ("u", 100.0, 1),   # anchor@10s rows -> tte 90
        ("u", 5000.0, 0),  # no event within 600s -> censored
        ("v", 0.0, 0),     # other key: never sees u's events
    ]
    df = spark.createDataFrame(
        [(k, _ts(s), e) for k, s, e in rows],
        "k string, ts timestamp, e int",
    )
    out = {
        (r["k"], r["ts"], r["e"]): (r["tte_s"], r["tte_observed"])
        for r in with_time_to_event(
            df, F.col("e") == 1, 600, keys="k", ts_col="ts"
        ).collect()
    }
    assert out[("u", _ts(0.0), 0)] == (10, True)
    # the event AT 10s is not its own label (strictly future frame);
    # both 10s rows see the 100s event
    assert out[("u", _ts(10.0), 1)] == (90, True)
    assert out[("u", _ts(10.0), 0)] == (90, True)
    assert out[("u", _ts(100.0), 1)] == (None, False)   # next event > 600s away
    assert out[("u", _ts(5000.0), 0)] == (None, False)  # censored tail
    assert out[("v", _ts(0.0), 0)] == (None, False)


def test_time_to_event_bucketed_equals_window(spark):
    random.seed(7)
    rows = []
    for k in ("a", "b", "c"):
        t = 0.0
        for _ in range(40):
            t += random.choice([1, 10, 300, 1799, 1800, 3600])
            rows.append((k, _ts(t), random.random() < 0.3))
    df = spark.createDataFrame(rows, "k string, ts timestamp, e boolean")
    kw = dict(event=F.col("e"), horizon_s=1800, keys="k", ts_col="ts")
    a = (
        with_time_to_event(df, **kw)
        .select("k", "ts", "tte_s", "tte_observed")
        .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    b = (
        with_time_to_event(df, strategy="bucketed", bucket_seconds=600, **kw)
        .select("k", "ts", "tte_s", "tte_observed")
        .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
