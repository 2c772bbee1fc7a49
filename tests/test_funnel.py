"""Units for the ordered-step funnel (operators/funnel.py): hand
fixture, brute-force twin equality on randomized streams, and the
one-exchange plan contract."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from didtool_spark.operators.funnel import funnel

T0 = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, i, _ts(s), e) for i, (k, s, e) in enumerate(rows)],
        "k string, i long, ts timestamp, e string",
    )


STEPS = lambda: [  # noqa: E731
    ("a", F.col("e") == "A"),
    ("b", F.col("e") == "B"),
    ("c", F.col("e") == "C"),
]


def test_funnel_hand_fixture(spark):
    rows = [
        ("u", 0.0, "B"),     # B before any A: not a completion
        ("u", 10.0, "A"),
        ("u", 20.0, "B"),    # completes b
        ("u", 30.0, "C"),    # completes c
        ("v", 0.0, "A"),
        ("v", 5.0, "C"),     # C without B: depth stops at a
        ("w", 0.0, "C"),
    ]
    out = {
        r["k"]: r
        for r in funnel(
            _mk(spark, rows), STEPS(), keys="k", order=("ts", "i")
        ).collect()
    }
    assert out["u"]["depth"] == 3
    assert out["u"]["a_ts"] == _ts(10) and out["u"]["b_ts"] == _ts(20)
    assert out["u"]["c_ts"] == _ts(30)
    assert out["v"]["depth"] == 1 and out["v"]["b_ts"] is None
    assert out["w"]["depth"] == 0


def test_funnel_same_row_matches_one_step_and_horizon(spark):
    rows = [
        ("u", 0.0, "A"),
        ("u", 0.0, "A"),    # duplicate step rows are fine
        ("u", 50.0, "B"),
        ("x", 0.0, "A"),
        ("x", 200.0, "B"),  # outside horizon 100 from a_ts
    ]
    df = _mk(spark, rows)
    steps = [("a", F.col("e") == "A"), ("b", F.col("e").isin("A", "B"))]
    out = {r["k"]: r for r in
           funnel(df, steps, keys="k", order=("ts", "i")).collect()}
    # second A row (strictly later ROW, same ts) may complete step b —
    # but the FIRST A row cannot complete both steps itself
    assert out["u"]["a_ts"] == _ts(0)
    assert out["u"]["b_ts"] == _ts(0)  # the duplicate A on a later row
    h = {r["k"]: r for r in
         funnel(df, STEPS()[:2], keys="k", order=("ts", "i"),
                horizon_s=100).collect()}
    assert h["u"]["b_ts"] == _ts(50)
    assert h["x"]["b_ts"] is None and h["x"]["depth"] == 1


def _brute(rows, steps, horizon=None):
    """Greedy earliest in-order scan per key (the documented
    semantics), in pure python."""
    bykey = {}
    for k, s, e in rows:
        bykey.setdefault(k, []).append((s, e))
    res = {}
    for k, evs in bykey.items():
        evs = sorted(range(len(evs)), key=lambda j: (evs[j][0], j)), evs
        idxs, evs = evs
        done = []
        si = 0
        anchor = None
        for j in idxs:
            t, e = evs[j]
            if si >= len(steps):
                break
            name, pred = steps[si]
            if pred(e) and (
                horizon is None or si == 0 or t <= anchor + horizon
            ):
                done.append(int(t))
                if si == 0:
                    anchor = t
                si += 1
        res[k] = done
    return res


def test_funnel_matches_brute_force(spark):
    random.seed(13)
    rows = []
    for k in range(12):
        t = 0.0
        for _ in range(30):
            t += random.choice([1, 5, 50, 500])
            rows.append((f"k{k}", t, random.choice("ABCX")))
    preds = {"a": lambda e: e == "A", "b": lambda e: e == "B",
             "c": lambda e: e == "C"}
    for horizon in (None, 100):
        want = _brute(rows, list(preds.items()), horizon)
        got = {
            r["k"]: [r["a_ts"], r["b_ts"], r["c_ts"]]
            for r in funnel(
                _mk(spark, rows), STEPS(), keys="k", order=("ts", "i"),
                horizon_s=horizon,
            ).collect()
        }
        for k, done in want.items():
            ts = [v for v in got[k] if v is not None]
            assert len(ts) == len(done), (horizon, k, got[k], done)
            for v, s in zip(ts, done):
                assert v == _ts(s), (horizon, k, got[k], done)


def test_funnel_single_exchange_plan(spark):
    import re

    from tests.test_plan_shape import plan_str

    out = funnel(
        _mk(spark, [("u", 0.0, "A")]), STEPS(), keys="k", order=("ts", "i")
    )
    p = plan_str(out)
    # the window cascade and the per-key rollup share one hash exchange
    n = len(re.findall(r"\(\d+\) Exchange", p))
    assert n == 1, p[:2500]
    assert "PythonUDF" not in p
