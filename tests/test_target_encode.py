"""Target encoding (operators/target_encode.py) vs pandas replays +
the zero-leakage property."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from didtool_spark.operators.target_encode import (
    apply_target_encoding,
    fit_target_encoding,
    target_encode,
)

M = 20.0


@pytest.fixture(scope="module")
def frame(spark):
    rows = []
    rng = np.random.RandomState(7)
    cats = ["a", "b", "c", None, "rare"]
    for i in range(400):
        c = cats[i % 4] if i != 37 else "rare"  # one singleton category
        rows.append((i, c, f"g{i % 3}", int(rng.rand() < (0.2 + 0.1 * (i % 4)))))
    df = spark.createDataFrame(rows, "id long, c1 string, c2 string, y int")
    return df, pd.DataFrame(rows, columns=["id", "c1", "c2", "y"])


SENT = "<null>"


def _k(s):
    return s.fillna(SENT)


def _pd_global(pdf, col, m=M):
    prior = pdf["y"].mean()
    g = pdf.assign(__k=_k(pdf[col])).groupby("__k")["y"].agg(["sum", "count"])
    return ((g["sum"] + m * prior) / (g["count"] + m)).to_dict()


def test_fit_apply_global_matches_pandas(frame):
    df, pdf = frame
    mapping = fit_target_encoding(df, ["c1", "c2"], "y", smoothing=M)
    out = apply_target_encoding(df, mapping, ["c1", "c2"]).toPandas()
    out = out.sort_values("id").reset_index(drop=True)
    for col in ["c1", "c2"]:
        exp = _k(pdf[col]).map(_pd_global(pdf, col)).astype(float)
        np.testing.assert_allclose(out[f"{col}_te"].values, exp.values, rtol=1e-12)


def test_apply_unseen_gets_default(spark, frame):
    df, _ = frame
    mapping = fit_target_encoding(df, ["c1"], "y", smoothing=M)
    new = spark.createDataFrame([(99, "NEVER-SEEN")], "id long, c1 string")
    got = apply_target_encoding(new, mapping, ["c1"], default=0.5).collect()
    assert got[0]["c1_te"] == 0.5
    got = apply_target_encoding(new, mapping, ["c1"]).collect()
    assert got[0]["c1_te"] is None


def test_loo_matches_pandas(frame):
    df, pdf = frame
    out = (
        target_encode(df, ["c1"], "y", method="loo", smoothing=M)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    prior = pdf["y"].mean()
    g = pdf.assign(__k=_k(pdf["c1"])).groupby("__k")["y"].agg(["sum", "count"])
    s = _k(pdf["c1"]).map(g["sum"]).astype(float)
    n = _k(pdf["c1"]).map(g["count"]).astype(float)
    exp = (s - pdf["y"] + M * prior) / (n - 1 + M)
    np.testing.assert_allclose(out["c1_te"].values, exp.values, rtol=1e-12)


def test_loo_singleton_encodes_to_prior(frame):
    df, pdf = frame
    out = target_encode(df, ["c1"], "y", method="loo", smoothing=M).toPandas()
    got = float(out.loc[out["c1"] == "rare", "c1_te"].iloc[0])
    np.testing.assert_allclose(got, pdf["y"].mean(), rtol=1e-12)
    # smoothing=0: singleton has no out-of-row evidence -> NULL
    out0 = target_encode(df, ["c1"], "y", method="loo", smoothing=0.0).toPandas()
    assert np.isnan(out0.loc[out0["c1"] == "rare", "c1_te"].iloc[0])


def _pd_oof(pdf, col, fold, m=M):
    pdf = pdf.assign(__k=_k(pdf[col]))
    cf = pdf.groupby(["__k", fold])["y"].agg(["sum", "count"])
    ct = pdf.groupby("__k")["y"].agg(["sum", "count"])
    ft = pdf.groupby(fold)["y"].agg(["sum", "count"])
    S, N = pdf["y"].sum(), len(pdf)
    vals = []
    for _, r in pdf.iterrows():
        k, f_ = r["__k"], r[fold]
        s_cf, n_cf = cf.loc[(k, f_)]
        s_c, n_c = ct.loc[k]
        prior = (S - ft.loc[f_, "sum"]) / (N - ft.loc[f_, "count"])
        den = n_c - n_cf + m
        vals.append((s_c - s_cf + m * prior) / den if den > 0 else np.nan)
    return np.array(vals, dtype=float)


def test_oof_matches_pandas(frame):
    df, pdf = frame
    df = df.withColumn("fold", F.pmod(F.col("id"), F.lit(3)).cast("int"))
    pdf = pdf.assign(fold=pdf["id"] % 3)
    out = (
        target_encode(df, ["c1", "c2"], "y", method="oof", fold_col="fold", smoothing=M)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    for col in ["c1", "c2"]:
        np.testing.assert_allclose(
            out[f"{col}_te"].values, _pd_oof(pdf, col, "fold"), rtol=1e-12
        )


def test_oof_zero_leakage(spark, frame):
    """Flipping every label inside fold 0 must NOT move the encoding of
    any fold-0 row (their statistics come from the other folds only) —
    the leakage property, tested directly."""
    df, _ = frame
    df = df.withColumn("fold", F.pmod(F.col("id"), F.lit(3)).cast("int"))
    flipped = df.withColumn(
        "y", F.when(F.col("fold") == 0, 1 - F.col("y")).otherwise(F.col("y"))
    )
    a = (
        target_encode(df, ["c1"], "y", method="oof", fold_col="fold")
        .where(F.col("fold") == 0)
        .select("id", "c1_te")
        .toPandas()
        .sort_values("id")
    )
    b = (
        target_encode(flipped, ["c1"], "y", method="oof", fold_col="fold")
        .where(F.col("fold") == 0)
        .select("id", "c1_te")
        .toPandas()
        .sort_values("id")
    )
    np.testing.assert_array_equal(a["c1_te"].values, b["c1_te"].values)


def test_oof_hash_folds_deterministic(frame):
    df, _ = frame
    a = target_encode(df, ["c1"], "y", method="oof", id_col="id").toPandas()
    b = target_encode(df, ["c1"], "y", method="oof", id_col="id").toPandas()
    a = a.sort_values("id").reset_index(drop=True)
    b = b.sort_values("id").reset_index(drop=True)
    np.testing.assert_array_equal(a["c1_te"].values, b["c1_te"].values)
    assert "__fold" not in a.columns


def test_rejects_bad_args(frame):
    df, _ = frame
    with pytest.raises(ValueError, match="method"):
        target_encode(df, ["c1"], "y", method="bogus")
    with pytest.raises(ValueError, match="fold_col or id_col"):
        target_encode(df, ["c1"], "y", method="oof")


def test_no_python_udf_in_plan(frame):
    """The whole oof path must stay JVM-side (codegen + joins)."""
    from tests.test_plan_shape import plan_str

    df, _ = frame
    out = target_encode(df, ["c1", "c2"], "y", method="oof", id_col="id")
    p = plan_str(out)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
