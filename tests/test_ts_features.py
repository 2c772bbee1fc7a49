"""ts_features operators vs hand/numpy oracles + strategy equivalence
+ plan shape.  The driver-gate oracles (demo_queries.SQL_DECAYED etc.)
replay the same semantics in DuckDB; these units pin the math and the
bucketed hot-key strategies independently of the gate."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F

from didtool_spark.operators.ts_features import (
    with_decayed,
    with_recency,
    with_rolling_distinct,
    with_trend,
    with_zscore,
)
from tests.test_plan_shape import plan_str

T0 = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def _mk(spark, rows):
    # rows: (key, secs, value)
    return spark.createDataFrame(
        [(k, _ts(s), i, v) for i, (k, s, v) in enumerate(rows)],
        "k string, ts timestamp, rid long, v double",
    )


def _brute_decayed(rows, hl):
    # per-row decayed sum/count over strictly earlier rows of the key
    lam = math.log(2.0) / hl
    out = []
    for i, (k, s, v) in enumerate(rows):
        terms = [
            (vv, ss)
            for j, (kk, ss, vv) in enumerate(rows)
            if kk == k and (ss < s or (ss == s and j < i))
        ]
        if not terms:
            out.append((None, None))
            continue
        cnt = sum(math.exp(-lam * (s - ss)) for _, ss in terms)
        vsum = sum(
            vv * math.exp(-lam * (s - ss)) for vv, ss in terms if vv is not None
        )
        has_v = any(vv is not None for vv, _ in terms)
        out.append((vsum if has_v else None, cnt))
    return out


ROWS = [
    ("a", 0.0, 10.0),
    ("a", 100.0, None),     # NULL value: drops from sum, counts in count
    ("a", 100.0, 5.0),      # tie on ts -> rid order breaks it
    ("a", 3600.0, 2.0),
    ("a", 90000.0, 7.0),    # next day (bucket crossing at small bw)
    ("b", 50.0, 1.0),
    ("b", 250000.0, 4.0),   # ~3 days later (empty buckets between)
]


def test_decayed_strategies_match_brute(spark):
    hl = 600.0
    exp = _brute_decayed(ROWS, hl)
    df = _mk(spark, ROWS)
    for strategy, bw in [("window", None), ("bucketed", 1200)]:
        out = with_decayed(
            df, [("v", "sum"), ("v", "count")], hl,
            keys="k", order=("ts", "rid"), ts_col="ts",
            strategy=strategy, bucket_seconds=bw,
        )
        got = {
            r["rid"]: (r["v_decsum_600s"], r["v_deccount_600s"])
            for r in out.collect()
        }
        for i, (es, ec) in enumerate(exp):
            gs, gc = got[i]
            if es is None:
                assert gs is None, (strategy, i, gs)
            else:
                assert abs(gs - es) < 1e-9 * max(1.0, abs(es)), (strategy, i)
            if ec is None:
                assert gc is None, (strategy, i, gc)
            else:
                assert abs(gc - ec) < 1e-9, (strategy, i)


def test_decayed_include_current(spark):
    df = _mk(spark, [("a", 0.0, 3.0)])
    out = with_decayed(
        df, [("v", "sum")], 60.0, keys="k", order=("ts", "rid"),
        ts_col="ts", include_current=True,
    ).collect()[0]
    assert abs(out["v_decsum_60s"] - 3.0) < 1e-12


def test_decayed_bucketed_randomized_equivalence(spark):
    rng = np.random.default_rng(11)
    rows = []
    for k in range(6):
        n = int(rng.integers(1, 60))
        secs = np.sort(rng.uniform(0, 50_000, n))
        for s in secs:
            v = None if rng.random() < 0.15 else float(rng.normal(0, 5))
            rows.append((f"k{k}", float(s), v))
    df = _mk(spark, rows)
    a = with_decayed(
        df, [("v", "sum"), ("v", "count")], 300.0,
        keys="k", order=("ts", "rid"), ts_col="ts",
    )
    b = with_decayed(
        df, [("v", "sum"), ("v", "count")], 300.0,
        keys="k", order=("ts", "rid"), ts_col="ts",
        strategy="bucketed", bucket_seconds=900,
    )
    pa = {r["rid"]: r for r in a.collect()}
    pb = {r["rid"]: r for r in b.collect()}
    for rid, ra in pa.items():
        rb = pb[rid]
        for c in ("v_decsum_300s", "v_deccount_300s"):
            if ra[c] is None:
                assert rb[c] is None, (rid, c, rb[c])
            else:
                assert abs(ra[c] - rb[c]) < 1e-9 * max(1.0, abs(ra[c])), (
                    rid, c, ra[c], rb[c],
                )


def test_decayed_bucketed_zero_cancel_carry(spark):
    # +5 and -5 at the same instant in an EARLIER bucket cancel the
    # carry to exactly 0.0; the later row's history is non-empty, so
    # the feature must be 0.0, not NULL.  Regression: the bucketed
    # strategy used carry == 0.0 as the empty-history test.
    rows = [
        ("a", 0.0, 5.0),
        ("a", 0.0, -5.0),
        ("a", 5000.0, 3.0),   # next bucket at bw=1200
    ]
    df = _mk(spark, rows)
    for strategy, bw in [("window", None), ("bucketed", 1200)]:
        out = with_decayed(
            df, [("v", "sum"), ("v", "count")], 600.0,
            keys="k", order=("ts", "rid"), ts_col="ts",
            strategy=strategy, bucket_seconds=bw,
        )
        got = {r["rid"]: r for r in out.collect()}
        assert got[2]["v_decsum_600s"] == 0.0, (strategy, got[2])
        # count never cancels: 2 * exp(-ln2 * 5000/600)
        exp_cnt = 2.0 * math.exp(-math.log(2.0) * 5000.0 / 600.0)
        assert abs(got[2]["v_deccount_600s"] - exp_cnt) < 1e-12, strategy


def test_decayed_overflow_guard():
    try:
        with_decayed(
            None, [("v", "sum")], 1.0, strategy="bucketed",
            bucket_seconds=86_400,
        )
    except ValueError as e:
        assert "overflow" in str(e)
    else:
        raise AssertionError("expected ValueError on overflow-bound bucket")


def test_decayed_single_exchange_window(spark):
    df = _mk(spark, ROWS)
    out = with_decayed(
        df, [("v", "sum")], 600.0, keys="k", order=("ts", "rid"), ts_col="ts"
    )
    import re

    p = plan_str(out)
    # rebase min + running sum share one Exchange+Sort
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p[:3000]


def test_recency_hand_oracle(spark):
    rows = [
        ("a", 0.0, "x"),
        ("a", 10.0, "err"),
        ("a", 25.0, "x"),
        ("a", 30.0, "err"),
        ("a", 60.0, "x"),
        ("b", 5.0, "x"),
    ]
    df = spark.createDataFrame(
        [(k, _ts(s), i, t) for i, (k, s, t) in enumerate(rows)],
        "k string, ts timestamp, rid long, typ string",
    )
    out = with_recency(
        df, {"err": F.col("typ") == "err"}, keys="k", order=("ts", "rid"),
        ts_col="ts",
    )
    got = {r["rid"]: r for r in out.collect()}
    assert got[0]["secs_since_prev"] is None
    assert got[1]["secs_since_prev"] == 10.0
    assert got[0]["secs_since_err"] is None and got[0]["rows_since_err"] is None
    assert got[2]["secs_since_err"] == 15.0 and got[2]["rows_since_err"] == 1
    # current row matching the predicate must NOT see itself
    assert got[3]["secs_since_err"] == 20.0 and got[3]["rows_since_err"] == 2
    assert got[4]["secs_since_err"] == 30.0 and got[4]["rows_since_err"] == 1
    assert got[5]["secs_since_err"] is None  # other key untouched


def test_recency_microsecond_precision(spark):
    a = dt.datetime(2024, 1, 1, 0, 0, 0, 250_000)
    b = dt.datetime(2024, 1, 1, 0, 0, 1, 750_000)
    df = spark.createDataFrame(
        [("a", a, 0), ("a", b, 1)], "k string, ts timestamp, rid long"
    )
    out = with_recency(df, keys="k", order=("ts", "rid"), ts_col="ts")
    got = {r["rid"]: r["secs_since_prev"] for r in out.collect()}
    assert got[1] == 1.5


def test_rolling_distinct_rows_hand(spark):
    rows = [("a", float(i), t) for i, t in enumerate(["x", "y", "x", None, "z"])]
    df = spark.createDataFrame(
        [(k, _ts(s), i, t) for i, (k, s, t) in enumerate(rows)],
        "k string, ts timestamp, rid long, typ string",
    )
    out = with_rolling_distinct(df, "typ", k=3, keys="k", order=("ts", "rid"))
    got = {r["rid"]: r["typ_nunique_last3"] for r in out.collect()}
    # NULL never counts; frame excludes current row
    assert [got[i] for i in range(5)] == [0, 1, 2, 2, 2]


def test_rolling_distinct_time_bucketed_equivalence(spark):
    rng = np.random.default_rng(23)
    rows = []
    for k in range(5):
        for s in np.sort(rng.uniform(0, 40_000, int(rng.integers(1, 80)))):
            rows.append((f"k{k}", float(s), str(rng.integers(0, 4))))
    df = spark.createDataFrame(
        [(k, _ts(s), i, t) for i, (k, s, t) in enumerate(rows)],
        "k string, ts timestamp, rid long, typ string",
    )
    kw = dict(seconds=3000, keys="k", order=("ts", "rid"), ts_col="ts")
    a = with_rolling_distinct(df, "typ", **kw)
    b = with_rolling_distinct(
        df, "typ", strategy="bucketed", bucket_seconds=3000, **kw
    )
    ga = {r["rid"]: r["typ_nunique_3000s"] for r in a.collect()}
    gb = {r["rid"]: r["typ_nunique_3000s"] for r in b.collect()}
    assert ga == gb


def test_trend_matches_polyfit(spark):
    rng = np.random.default_rng(5)
    secs = np.sort(rng.uniform(0, 1000, 30))
    vals = 3.0 * secs + rng.normal(0, 1, 30)
    rows = [("a", float(s), float(v)) for s, v in zip(secs, vals)]
    df = _mk(spark, rows)
    out = with_trend(df, "v", 8, keys="k", order=("ts", "rid"), ts_col="ts")
    got = {r["rid"]: r["v_slope_last8"] for r in out.collect()}
    for i in range(30):
        lo = max(0, i - 8)
        xs, ys = secs[lo:i], vals[lo:i]
        if len(xs) < 2:
            assert got[i] is None
            continue
        exp = float(np.polyfit(xs, ys, 1)[0])
        assert abs(got[i] - exp) < 1e-6 * max(1.0, abs(exp)), i


def test_trend_null_on_degenerate(spark):
    # one point, and two points at the same timestamp -> denom == 0
    rows = [("a", 0.0, 1.0), ("a", 0.0, 2.0), ("a", 0.0, 3.0)]
    df = _mk(spark, rows)
    out = with_trend(df, "v", 5, keys="k", order=("ts", "rid"), ts_col="ts")
    assert all(r["v_slope_last5"] is None for r in out.collect())


def test_zscore_matches_pandas(spark):
    rng = np.random.default_rng(9)
    rows = [("a", float(i * 10), float(v)) for i, v in enumerate(rng.normal(2, 3, 50))]
    df = _mk(spark, rows)
    out = with_zscore(df, "v", 10, keys="k", order=("ts", "rid"))
    got = {r["rid"]: r["v_z_last10"] for r in out.collect()}
    vals = [v for _, _, v in rows]
    import pandas as pd

    s = pd.Series(vals)
    m = s.rolling(10, min_periods=1).mean().shift(1)
    sd = s.rolling(10, min_periods=2).std().shift(1)
    for i in range(50):
        if i < 2 or sd[i] == 0 or np.isnan(sd[i]):
            assert got[i] is None
        else:
            exp = (vals[i] - m[i]) / sd[i]
            assert abs(got[i] - exp) < 1e-9, i


def test_zscore_bucketed_equivalence(spark):
    rng = np.random.default_rng(31)
    rows = []
    for k in range(4):
        for s in np.sort(rng.uniform(0, 200_000, int(rng.integers(2, 70)))):
            rows.append((f"k{k}", float(s), float(rng.normal(0, 2))))
    df = _mk(spark, rows)
    a = with_zscore(df, "v", 7, keys="k", order=("ts", "rid"))
    b = with_zscore(
        df, "v", 7, keys="k", order=("ts", "rid"),
        strategy="bucketed", bucket_ts_col="ts", bucket_seconds=50_000,
    )
    ga = {r["rid"]: r["v_z_last7"] for r in a.collect()}
    gb = {r["rid"]: r["v_z_last7"] for r in b.collect()}
    for rid, va in ga.items():
        vb = gb[rid]
        if va is None:
            assert vb is None, rid
        else:
            assert abs(va - vb) < 1e-9, rid


def test_shared_sort_plan_shape(spark):
    # recency + trend + zscore on the same (keys, order) reuse one
    # Exchange: the whole feature block is a single shuffle.
    df = _mk(spark, ROWS)
    out = with_recency(df, keys="k", order=("ts", "rid"), ts_col="ts")
    out = with_trend(out, "v", 8, keys="k", order=("ts", "rid"), ts_col="ts")
    out = with_zscore(out, "v", 10, keys="k", order=("ts", "rid"))
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan_str(out))) == 1


# ----------------------------------------------------------------- cusum

def test_cusum_matches_recursion_twin(spark):
    """The window linearization must equal Page's literal recursion,
    NULLs leaving the state untouched."""
    import datetime as dt
    import random

    from didtool_spark.operators.ts_features import with_cusum

    random.seed(5)
    rows = []
    for k in ("a", "b"):
        for i in range(60):
            v = None if i % 11 == 7 else random.gauss(10 if i < 30 else 14, 2)
            rows.append((k, i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), v))
    df = spark.createDataFrame(rows, "k string, i int, ts timestamp, v double")
    out = {
        (r["k"], r["i"]): (r["v_cusum_pos"], r["v_cusum_neg"], r["v_cusum_alarm"])
        for r in with_cusum(
            df, "v", target=10.0, slack=0.5, threshold=8.0,
            keys="k", order=("ts", "i"),
        ).collect()
    }
    for k in ("a", "b"):
        pos = neg = 0.0
        for i in range(60):
            v = next(r[3] for r in rows if r[0] == k and r[1] == i)
            if v is not None:
                pos = max(0.0, pos + (v - 10.0 - 0.5))
                neg = max(0.0, neg - (v - 10.0 + 0.5))
            gp, gn, alarm = out[(k, i)]
            assert abs(gp - pos) < 1e-9 and abs(gn - neg) < 1e-9, (k, i)
            assert alarm == (pos > 8.0 or neg > 8.0), (k, i)
    # the upward shift in the second half must alarm on pos
    assert any(out[("a", i)][2] for i in range(35, 60))


def test_cusum_bucketed_equals_window(spark):
    import datetime as dt
    import random

    import pandas as pd

    from didtool_spark.operators.ts_features import with_cusum

    random.seed(9)
    rows = []
    for k in ("a", "b", "c"):
        t = 0.0
        for i in range(50):
            t += random.choice([60, 600, 1800, 3601])
            v = None if i % 13 == 5 else random.gauss(12, 4)
            rows.append((k, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), v))
    df = spark.createDataFrame(rows, "k string, i int, ts timestamp, v double")
    kw = dict(value_col="v", target=12.0, slack=0.3, threshold=10.0,
              keys="k", order=("ts", "i"))
    sel = ["k", "i", "v_cusum_pos", "v_cusum_neg", "v_cusum_alarm"]
    a = (
        with_cusum(df, **kw).select(*sel)
        .toPandas().sort_values(["k", "i"]).reset_index(drop=True)
    )
    b = (
        with_cusum(df, strategy="bucketed", bucket_seconds=3600, **kw)
        .select(*sel)
        .toPandas().sort_values(["k", "i"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_exact=False, atol=1e-9, rtol=1e-9)


def test_seasonal_decompose_identity_and_signal(spark):
    """Additive identity holds exactly; a planted hour-of-day signal is
    recovered in the seasonal component; trend tracks a linear drift."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from didtool_spark.operators.ts_features import seasonal_decompose

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(24 * 20):  # 20 days of hourly values
        season = 10.0 * np.sin(2 * np.pi * (h % 24) / 24)
        trend = 0.05 * h
        rows.append((t0 + dt.timedelta(hours=h), trend + season))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["ts", "value"]))
    out = (
        seasonal_decompose(df, "value", ts_col="ts", grain="hour", period=24)
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    assert len(out) == 24 * 20
    # exact additive identity
    np.testing.assert_allclose(
        out.y, out.trend + out.seasonal + out.residual, atol=1e-9
    )
    # seasonal component recovers the sine shape (interior hours)
    mid = out.iloc[48:-48]
    by_idx = mid.groupby("season_idx").seasonal.mean()
    expect = 10.0 * np.sin(2 * np.pi * np.arange(24) / 24)
    assert np.corrcoef(by_idx.reindex(range(24)), expect)[0, 1] > 0.99
    # residuals are tiny for a noise-free series (away from the edges)
    assert mid.residual.abs().median() < 0.5
    # trend is increasing overall
    assert out.trend.iloc[-13] > out.trend.iloc[12]


def test_seasonal_decompose_per_key(spark):
    import datetime as dt

    import pandas as pd

    from didtool_spark.operators.ts_features import seasonal_decompose

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for k, level in (("a", 0.0), ("b", 100.0)):
        for h in range(48):
            rows.append((k, t0 + dt.timedelta(hours=h), level + h % 24))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "ts", "value"])
    )
    out = seasonal_decompose(
        df, "value", ts_col="ts", keys="k", grain="hour", period=24
    ).toPandas()
    assert set(out.k) == {"a", "b"}
    # levels stay separated per key in the trend
    assert out[out.k == "b"].trend.min() > out[out.k == "a"].trend.max()


def test_seasonal_decompose_gap_robust_index(spark):
    """A missing bucket must NOT shift later buckets' season indices —
    the index is calendar-derived, not ordinal."""
    import datetime as dt

    import pandas as pd

    from didtool_spark.operators.ts_features import seasonal_decompose

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(hours=h), float(h))
        for h in range(72)
        if h != 3  # one empty hour
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["ts", "value"]))
    out = seasonal_decompose(
        df, "value", ts_col="ts", grain="hour", period=24
    ).toPandas()
    got = dict(zip(out.bucket_ts, out.season_idx))
    for ts_, idx in got.items():
        assert idx == ts_.hour, (ts_, idx)


def test_seasonal_decompose_rejects_unknown_grain(spark):
    import pandas as pd
    import pytest as _pytest

    from didtool_spark.operators.ts_features import seasonal_decompose

    df = spark.createDataFrame(
        pd.DataFrame({"ts": [pd.Timestamp("2024-01-01")], "value": [1.0]})
    )
    with _pytest.raises(ValueError):
        seasonal_decompose(df, "value", grain="month")


def test_seasonal_decompose_day_grain_dst_safe(spark):
    """ADVICE r4: with a DST session timezone, a 23/25-hour local day
    makes floor(epoch/86400) repeat or skip a season index at each
    transition; the day/week index is calendar-derived (datediff) so
    consecutive local days always get consecutive indices."""
    import datetime as dt

    import pandas as pd

    from didtool_spark.operators.ts_features import seasonal_decompose

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        # 2026-03-08 is the US spring-forward date (23-hour local day)
        rows = [
            (dt.datetime(2026, 3, 5 + d, 12, 0), float(d))
            for d in range(8)
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["ts", "value"])
        )
        out = (
            seasonal_decompose(df, "value", ts_col="ts", grain="day", period=7)
            .toPandas()
            .sort_values("bucket_ts")
            .reset_index(drop=True)
        )
        idx = out.season_idx.tolist()
        assert len(out) == 8
        # consecutive days -> consecutive (mod 7) indices, straight
        # through the DST transition
        for a, b in zip(idx, idx[1:]):
            assert b == (a + 1) % 7, idx
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
