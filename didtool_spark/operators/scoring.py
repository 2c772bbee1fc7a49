"""Distributed scoring of an exported (driver-trained) model.

The reference trains LightGBM on the driver and scores with
predict_proba (model.py:230-231). Model *training* stays out of engine
scope (SURVEY.md §2.7); scoring distributes naturally: broadcast the
fitted predictor into an Arrow-batched pandas UDF — vectorized batches,
no per-row Python.

Works with any picklable ``predict(pandas.DataFrame) -> 1-D array``
(an exported LightGBM booster's predict, a sklearn pipeline, or a plain
numpy function).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DoubleType


def score_expr(
    df: DataFrame,
    predict: Callable[[pd.DataFrame], "object"],
    feature_cols: Sequence[str],
) -> Column:
    """Column of predictions for ``feature_cols`` via a broadcast model.

    The predictor is shipped once per executor (Spark broadcasts the
    pickled closure); each Arrow batch is scored in one vectorized call.
    """
    # explicit broadcast when the predictor is plain-picklable (big
    # boosters ship once per executor); closures fall back to
    # cloudpickled UDF capture
    try:
        bc = df.sparkSession.sparkContext.broadcast(predict)

        def fn(batch):
            return bc.value(batch)
    except Exception:
        fn = predict

    @F.pandas_udf(DoubleType())
    def _score(*cols: pd.Series) -> pd.Series:
        batch = pd.DataFrame({name: c for name, c in zip(feature_cols, cols)})
        return pd.Series(fn(batch)).astype("float64")

    return _score(*[F.col(c) for c in feature_cols])


def with_score(
    df: DataFrame,
    predict: Callable[[pd.DataFrame], "object"],
    feature_cols: Sequence[str],
    out_col: str = "prob",
) -> DataFrame:
    return df.withColumn(out_col, score_expr(df, predict, feature_cols))
