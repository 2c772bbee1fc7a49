"""Broadcast-model pandas_udf scoring (SURVEY.md §2.7 scoring path)."""

import numpy as np
import pandas as pd

from didtool_spark.operators.scoring import with_score


def test_with_score_matches_local(spark):
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame(
        {"i": range(500), "a": rng.randn(500), "b": rng.randn(500)}
    )
    df = spark.createDataFrame(pdf)

    w = np.array([0.7, -1.3])

    def predict(batch: pd.DataFrame) -> np.ndarray:
        z = batch[["a", "b"]].values @ w
        return 1.0 / (1.0 + np.exp(-z))

    got = (
        with_score(df, predict, ["a", "b"])
        .orderBy("i")
        .toPandas()["prob"]
        .values
    )
    np.testing.assert_allclose(got, predict(pdf), rtol=1e-12)


def test_stacking_evaluate(spark):
    """Own-fold prob for train rows, fold-mean for oot (reference
    model.py:645-658), checked against a pandas recomputation."""
    import numpy as np
    import pandas as pd
    from didtool_spark.operators.scoring import stacking_evaluate
    from didtool_spark.operators.split import split_data_stacking
    from pyspark.sql import functions as F

    rng = np.random.RandomState(4)
    rows = [
        (i, float(rng.rand()), float(rng.rand()), int(rng.rand() < 0.4), i >= 800)
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y int, oot boolean")
    df = split_data_stacking(df, F.col("oot"), n_fold=3, key_cols=["id"])

    # three deterministic "fold models"
    def mk(w1, w2):
        return lambda b: w1 * b["x1"] + w2 * b["x2"]

    preds = [mk(1.0, 0.0), mk(0.0, 1.0), mk(0.5, 0.5)]
    out, fold_auc = stacking_evaluate(
        df, preds, ["x1", "x2"], label_col="y"
    )
    assert "x1" not in out.columns and "x2" not in out.columns
    pdf = out.toPandas().set_index("id")
    src = pd.DataFrame(rows, columns=["id", "x1", "x2", "y", "oot"]).set_index("id")
    probs = pd.DataFrame({k: preds[k](src) for k in range(3)})
    for i in src.index:
        grp = pdf.loc[i, "group"]
        expect = (
            probs.loc[i].mean() if grp < 0 else probs.loc[i, int(grp)]
        )
        assert abs(pdf.loc[i, "prob"] - expect) < 1e-12
    assert len(fold_auc) == 3 and fold_auc["val_auc"].notna().all()
