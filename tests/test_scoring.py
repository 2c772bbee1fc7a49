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
