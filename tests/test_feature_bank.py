"""Units for the feature-bank extensions: hashing-trick features,
calibration/agreement metrics, sequence features, embedding pooling.
The driver-gate oracles (demo_queries SQL_FEATURE_CROSS etc.) replay
the same semantics in DuckDB; these pin the math, NULL edges, and the
canonical-form invariants independently of the gate."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F

from didtool_spark.operators.calibration import (
    calibration_metrics,
    cohen_kappa,
    reliability_table,
)
from didtool_spark.operators.feature_hash import hash_vectorize, hashed_cross
from didtool_spark.operators.pooling import pool_embeddings
from didtool_spark.operators.seq_features import (
    transition_counts,
    with_turn_novelty,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


# ------------------------------------------------------------ hashing


def test_hashed_cross_null_is_a_level(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), (None, "x"), (None, None)],
        "c1 string, c2 string",
    )
    out = hashed_cross(df, ["c1", "c2"], 1_000_000).collect()
    buckets = [r["c1_x_c2_b"] for r in out]
    assert all(b is not None and 0 <= b < 1_000_000 for b in buckets)
    # (NULL, 'x') and ('a', NULL) must cross differently, and the
    # same inputs must cross identically across rows
    assert buckets[1] != buckets[2]
    again = [r["c1_x_c2_b"] for r in hashed_cross(df, ["c1", "c2"], 1_000_000).collect()]
    assert buckets == again


def test_hash_vectorize_canonical_and_merged(spark):
    # n_features=1 forces EVERY token into slot 0 -> one merged entry
    df = spark.createDataFrame(
        [("u", 2.0, 3.0)], "c string, x double, y double"
    )
    out = hash_vectorize(
        df, cat_cols=["c"], num_cols=["x", "y"], n_features=1, signed=False
    ).collect()[0]["features"]
    assert len(out) == 1
    assert out[0]["idx"] == 0
    assert abs(out[0]["v"] - 6.0) < 1e-12  # 1.0 + 2.0 + 3.0


def test_hash_vectorize_sorted_null_numeric_drops(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", 4.0)], "c string, x double"
    )
    rows = hash_vectorize(
        df, cat_cols=["c"], num_cols=["x"], n_features=2**16
    ).collect()
    for r in rows:
        idxs = [e["idx"] for e in r["features"]]
        assert idxs == sorted(idxs)
        assert all(0 <= i < 2**16 for i in idxs)
    # NULL numeric drops: row 0 has only the categorical token
    n_by_c = {r["c"]: len(r["features"]) for r in rows}
    assert n_by_c["a"] == 1 and n_by_c["b"] == 2


def test_hash_vectorize_engines_agree_on_structure(spark):
    # xxhash64 and md5_60 give different indices but identical
    # multiset of values (same tokens, same signs-up-to-hash)
    df = spark.createDataFrame([("a", 2.0)], "c string, x double")
    for fn in ("xxhash64", "md5_60"):
        feats = hash_vectorize(
            df, cat_cols=["c"], num_cols=["x"], n_features=2**20, hash_fn=fn
        ).collect()[0]["features"]
        assert sorted(abs(e["v"]) for e in feats) == [1.0, 2.0], fn


# ------------------------------------------------------- calibration


def _cal_fixture(spark, n=400, seed=3):
    rng = np.random.default_rng(seed)
    scores = rng.uniform(0, 1, n)
    labels = (rng.uniform(0, 1, n) < scores * 0.8).astype(int)
    rows = [(float(s), int(y)) for s, y in zip(scores, labels)]
    rows += [(None, 1), (0.5, None)]  # excluded
    return (
        spark.createDataFrame(rows, "score double, y int"),
        scores,
        labels,
    )


def test_reliability_table_matches_numpy(spark):
    df, scores, labels = _cal_fixture(spark)
    got = {r["bin"]: r for r in reliability_table(df, "score", "y", 10).collect()}
    bins = np.minimum((scores * 10).astype(int), 9)
    for b in np.unique(bins):
        m = bins == b
        r = got[int(b)]
        assert r["n"] == int(m.sum())
        assert abs(r["avg_score"] - scores[m].mean()) < 1e-9
        assert abs(r["event_rate"] - labels[m].mean()) < 1e-9
        assert abs(r["gap"] - abs(labels[m].mean() - scores[m].mean())) < 1e-9


def test_calibration_metrics_match_numpy(spark):
    df, scores, labels = _cal_fixture(spark)
    r = calibration_metrics(df, "score", "y", 10).collect()[0]
    assert r["n"] == len(scores)
    assert abs(r["brier"] - np.mean((scores - labels) ** 2)) < 1e-9
    bins = np.minimum((scores * 10).astype(int), 9)
    gaps, ns = [], []
    for b in np.unique(bins):
        m = bins == b
        gaps.append(abs(labels[m].mean() - scores[m].mean()))
        ns.append(m.sum())
    gaps, ns = np.array(gaps), np.array(ns)
    assert abs(r["ece"] - (gaps * ns).sum() / ns.sum()) < 1e-9
    assert abs(r["mce"] - gaps.max()) < 1e-9


def test_cohen_kappa_hand_oracle(spark):
    # contingency: [[20, 5], [10, 15]] -> known kappa
    rows = [(0, 0)] * 20 + [(0, 1)] * 5 + [(1, 0)] * 10 + [(1, 1)] * 15
    rows += [(None, 0), (1, None)]  # excluded
    df = spark.createDataFrame(rows, "a int, b int")
    r = cohen_kappa(df, "a", "b").collect()[0]
    n = 50
    po = 35 / n
    pe = (25 * 30 + 25 * 20) / (n * n)
    assert r["n"] == n
    assert abs(r["po"] - po) < 1e-12
    assert abs(r["pe"] - pe) < 1e-12
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-12


def test_cohen_kappa_degenerate_null(spark):
    df = spark.createDataFrame([(1, 1)] * 5, "a int, b int")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r["pe"] == 1.0 and r["kappa"] is None


# ---------------------------------------------------- sequence feats


def test_transition_counts_hand_oracle(spark):
    rows = [
        ("u", 0.0, "a"), ("u", 1.0, "b"), ("u", 2.0, "b"),
        ("u", 3.0, None), ("u", 4.0, "a"),   # NULL is a real level
        ("v", 0.0, "a"),                      # single row: no transition
    ]
    df = spark.createDataFrame(
        [(k, _ts(s), i, t) for i, (k, s, t) in enumerate(rows)],
        "k string, ts timestamp, rid long, st string",
    )
    out = transition_counts(df, "st", keys="k", order=("ts", "rid"))
    got = {(r["k"], r["from"], r["to"]): r["n"] for r in out.collect()}
    assert got == {
        ("u", "a", "b"): 1,
        ("u", "b", "b"): 1,
        ("u", "b", None): 1,
        ("u", None, "a"): 1,
    }
    # corpus-level mode drops the key
    tot = transition_counts(df, "st", keys="k", order=("ts", "rid"), per_key=False)
    assert {tuple(r) for r in tot.collect()} == {
        ("a", "b", 1), ("b", "b", 1), ("b", None, 1), (None, "a", 1),
    }


def test_turn_novelty_hand_oracle(spark):
    rows = [
        ("u", 0.0, "Hello world"),
        ("u", 1.0, "hello there World"),   # {hello,world} vs {hello,there,world}
        ("u", 2.0, ""),                     # empty vs non-empty -> 0.0
        ("u", 3.0, None),                   # NULL after empty -> both empty -> NULL
        ("u", 4.0, "fresh words"),          # after empty prev -> 0.0
    ]
    df = spark.createDataFrame(
        [(k, _ts(s), i, t) for i, (k, s, t) in enumerate(rows)],
        "k string, ts timestamp, rid long, txt string",
    )
    out = with_turn_novelty(df, "txt", keys="k", order=("ts", "rid"))
    got = {r["rid"]: r["txt_jaccard_prev"] for r in out.collect()}
    assert got[0] is None                       # first row of key
    assert abs(got[1] - 2.0 / 3.0) < 1e-12
    assert got[2] == 0.0
    assert got[3] is None                       # both token sets empty
    assert got[4] == 0.0


def test_turn_novelty_exact_repeat_is_one(spark):
    df = spark.createDataFrame(
        [("u", _ts(0), 0, "same same text!"), ("u", _ts(1), 1, "TEXT same")],
        "k string, ts timestamp, rid long, txt string",
    )
    out = with_turn_novelty(df, "txt", keys="k", order=("ts", "rid"))
    assert out.collect()[1]["txt_jaccard_prev"] == 1.0


# --------------------------------------------------------- pooling


def test_pool_embeddings_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = {k: rng.normal(0, 1, (5, 8)) for k in ("a", "b")}
    rows = [
        (k, [float(x) for x in v]) for k, vs in vecs.items() for v in vs
    ] + [("a", None)]  # NULL embedding excluded
    df = spark.createDataFrame(rows, "k string, emb array<double>")
    out = pool_embeddings(df, "emb", keys="k", aggs=("mean", "max"))
    got = {r["k"]: r for r in out.collect()}
    for k, vs in vecs.items():
        assert got[k]["n_vecs"] == 5
        np.testing.assert_allclose(got[k]["emb_mean"], vs.mean(axis=0), atol=1e-12)
        np.testing.assert_allclose(got[k]["emb_max"], vs.max(axis=0), atol=1e-12)


def test_pool_embeddings_l2_normalize(spark):
    df = spark.createDataFrame(
        [("a", [3.0, 4.0]), ("a", [3.0, 4.0])], "k string, emb array<double>"
    )
    r = pool_embeddings(
        df, "emb", keys="k", aggs=("mean",), l2_normalize=True
    ).collect()[0]
    np.testing.assert_allclose(r["emb_mean"], [0.6, 0.8], atol=1e-12)
    # zero vectors stay zero instead of NaN
    z = spark.createDataFrame([("z", [0.0, 0.0])], "k string, emb array<double>")
    rz = pool_embeddings(
        z, "emb", keys="k", aggs=("mean",), l2_normalize=True
    ).collect()[0]
    assert list(rz["emb_mean"]) == [0.0, 0.0]


def test_pool_embeddings_long_matches_packed(spark):
    rng = np.random.default_rng(13)
    rows = [
        (int(k), [float(x) for x in rng.normal(0, 1, 4)])
        for k in range(3)
        for _ in range(4)
    ]
    df = spark.createDataFrame(rows, "k int, emb array<double>")
    packed = {r["k"]: r["emb_mean"] for r in
              pool_embeddings(df, "emb", keys="k", aggs=("mean",)).collect()}
    long = pool_embeddings(df, "emb", keys="k", aggs=("mean",), long=True)
    for r in long.collect():
        assert abs(packed[r["k"]][r["dim"]] - r["mean"]) < 1e-12


def test_transitions_and_novelty_bucketed_equivalence(spark):
    # randomized window == bucketed (the with_lags carry-in) for both
    # sequence ops — the hot-key strategy must be output-identical
    rng = np.random.default_rng(47)
    rows = []
    for k in range(6):
        n = int(rng.integers(1, 80))
        for s in np.sort(rng.uniform(0, 400_000, n)):
            st = None if rng.random() < 0.1 else f"s{rng.integers(0, 4)}"
            txt = None if rng.random() < 0.15 else " ".join(
                f"w{rng.integers(0, 6)}" for _ in range(int(rng.integers(0, 5)))
            )
            rows.append((f"k{k}", float(s), st, txt))
    df = spark.createDataFrame(
        [(k, _ts(s), i, st, tx) for i, (k, s, st, tx) in enumerate(rows)],
        "k string, ts timestamp, rid long, st string, txt string",
    )
    kw = dict(keys="k", order=("ts", "rid"))
    a = transition_counts(df, "st", **kw)
    b = transition_counts(
        df, "st", strategy="bucketed", ts_col="ts", bucket_seconds=50_000, **kw
    )
    ga = {(r["k"], r["from"], r["to"]): r["n"] for r in a.collect()}
    gb = {(r["k"], r["from"], r["to"]): r["n"] for r in b.collect()}
    assert ga == gb and sum(ga.values()) > 50

    na = with_turn_novelty(df, "txt", **kw)
    nb = with_turn_novelty(
        df, "txt", strategy="bucketed", ts_col="ts", bucket_seconds=50_000, **kw
    )
    pa = {r["rid"]: r["txt_jaccard_prev"] for r in na.collect()}
    pb = {r["rid"]: r["txt_jaccard_prev"] for r in nb.collect()}
    assert set(pa) == set(pb)
    for rid, va in pa.items():
        vb = pb[rid]
        if va is None:
            assert vb is None, rid
        else:
            assert abs(va - vb) < 1e-12, rid


# ---------------------------------------------------------- isotonic


def test_isotonic_properties_and_twin(spark):
    from didtool_spark.operators.calibration import (
        apply_isotonic, fit_isotonic, isotonic_fit_points,
    )

    rng = np.random.default_rng(53)
    xs = rng.uniform(0, 1, 600)
    ps = 0.1 + 0.8 * xs
    ys = (rng.uniform(0, 1, 600) < ps).astype(int)
    df = spark.createDataFrame(
        [(float(x), int(y)) for x, y in zip(xs, ys)], "s double, y int"
    )
    m = fit_isotonic(df, "s", "y", n_bins=32)
    # pure-Python twin is bit-identical (the oracle-replay contract)
    tw = isotonic_fit_points(xs, ys, n_bins=32)
    assert m == tw
    v = m["values"]
    assert all(a <= b + 1e-15 for a, b in zip(v, v[1:]))  # monotone
    assert all(0.0 <= x <= 1.0 for x in v)
    # weighted mean preservation: sum over rows of fitted == sum(y)
    out = apply_isotonic(df, m, "s").agg(F.sum("s_cal")).collect()[0][0]
    assert abs(out - ys.sum()) < 1e-6


def test_isotonic_hand_case_and_antitonic(spark):
    from didtool_spark.operators.calibration import isotonic_fit_points

    # 4 exact bins with rates [0.1, 0.3, 0.2, 0.4] equal weight:
    # PAV pools the middle violator pair to 0.25
    xs, ys = [], []
    for b, rate in enumerate([0.1, 0.3, 0.2, 0.4]):
        for i in range(10):
            xs.append(b * 1.0)
            ys.append(1 if i < rate * 10 else 0)
    m = isotonic_fit_points(xs, ys, n_bins=4)
    assert [round(v, 10) for v in m["values"]] == [0.1, 0.25, 0.25, 0.4]
    # perfectly anti-monotone input pools to one global block
    m2 = isotonic_fit_points(
        [0.0, 1.0, 2.0, 3.0], [1, 1, 0, 0], n_bins=4
    )
    assert m2["values"] == [0.5] * 4


def test_isotonic_apply_null_and_clip(spark):
    from didtool_spark.operators.calibration import apply_isotonic

    m = {"lo": 0.0, "hi": 1.0, "n_bins": 4,
         "values": [0.1, 0.2, 0.3, 0.4]}
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (0.999,), (7.0,), (None,)], "s double"
    )
    got = [r["s_cal"] for r in apply_isotonic(df, m, "s").collect()]
    assert got[0] == 0.1      # clip below
    assert got[1] == 0.1
    assert got[2] == 0.4
    assert got[3] == 0.4      # clip above
    assert got[4] is None     # NULL passes through


def test_distribution_distance_metrics(spark):
    from didtool_spark.operators.calibration import distribution_distance
    from didtool_spark.operators.metrics import psi as batch_psi

    rng = np.random.default_rng(59)
    e = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0, 1, 800)], "x double"
    )
    a = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0.8, 1, 700)], "x double"
    )
    d = distribution_distance(e, a, "x", n_bins=10)
    # psi matches the reference-parity batch psi exactly
    assert abs(d["psi"] - batch_psi(e, a, "x", n_bins=10)) < 1e-12
    # shifted distributions separate on every metric; bounds hold
    assert 0 < d["ks"] <= 1 and 0 < d["tvd"] <= 1
    assert 0 < d["jsd"] <= np.log(2) + 1e-12
    assert d["n_expected"] == 800 and d["n_actual"] == 700
    # identical inputs -> (near-)zero distances
    z = distribution_distance(e, e, "x", n_bins=10)
    assert z["psi"] < 1e-12 and z["ks"] < 1e-12 and z["jsd"] < 1e-12
    # numpy cross-check of the binned KS on the same edges
    from didtool_spark.operators.binning import step_edges

    edges = np.array(step_edges(e, "x", 10, remove_empty_bins=False))
    ev = np.array([r["x"] for r in e.collect()])
    av = np.array([r["x"] for r in a.collect()])
    ce = np.clip(
        np.histogram(ev, bins=edges)[0] / len(ev), 1e-10, None
    ).cumsum()
    ca = np.clip(
        np.histogram(av, bins=edges)[0] / len(av), 1e-10, None
    ).cumsum()
    assert abs(d["ks"] - np.abs(ce - ca).max()) < 1e-9


def test_drift_timeline_matches_distribution_distance(spark):
    """Each period row of the distributed timeline must equal
    distribution_distance run on that period's slice alone (same
    expected edges, same floors)."""
    import datetime as _dt

    from didtool_spark.operators.calibration import (
        distribution_distance,
        drift_timeline,
    )

    rng = np.random.default_rng(11)
    base = _dt.datetime(2024, 1, 1)
    exp_rows = [
        (float(v), base) for v in rng.normal(10, 3, 400)
    ]
    act_rows = [
        (float(v), base + _dt.timedelta(days=int(d)))
        for v, d in zip(
            rng.normal(11, 4, 600), rng.integers(0, 21, 600)
        )
    ]
    expected = spark.createDataFrame(exp_rows, "value double, ts timestamp")
    actual = spark.createDataFrame(act_rows, "value double, ts timestamp")
    tl = {
        r["period_ts"]: r
        for r in drift_timeline(
            expected, actual, "value", period="week", n_bins=8
        ).collect()
    }
    assert len(tl) == 3  # days 0-20 from Monday 2024-01-01 -> 3 ISO weeks
    for pts, row in tl.items():
        sl = actual.where(
            F.date_trunc("week", "ts") == F.lit(pts)
        )
        d = distribution_distance(expected, sl, "value", n_bins=8)
        assert row["n"] == d["n_actual"]
        for m in ("psi", "ks", "jsd", "tvd"):
            assert abs(row[m] - d[m]) < 1e-9, (pts, m, row[m], d[m])
