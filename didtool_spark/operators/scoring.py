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
    # cloudpickled UDF capture. Probe with pickle.dumps first —
    # sparkContext.broadcast logs a traceback before raising, which
    # would spam stderr for every closure-based predictor.
    import pickle

    try:
        pickle.dumps(predict)
        plain_picklable = True
    except Exception:
        plain_picklable = False
    if plain_picklable:
        bc = df.sparkSession.sparkContext.broadcast(predict)

        def fn(batch):
            return bc.value(batch)
    else:
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


def stacking_evaluate(
    df: DataFrame,
    predicts: Sequence[Callable[[pd.DataFrame], "object"]],
    feature_cols: Sequence[str],
    group_col: str = "group",
    label_col: str | None = None,
) -> tuple[DataFrame, pd.DataFrame | None]:
    """Fold-stacking evaluation (reference LGBModelStacking.evaluate,
    model.py:636-704) as pure DataFrame math: every row is scored by
    every fold model (one broadcast pandas UDF column per fold), and the
    final ``prob`` is the row's OWN-fold probability for train rows
    (group k >= 0 — i.e. the model that did NOT see the row in
    training scores it) and the fold-MEAN for oot rows (group -1,
    model.py:645-658). Feature columns are dropped from the result like
    the reference's ``data.drop(feature_names)``.

    With ``label_col`` also returns the reference's per-fold train/val
    AUC table (model.py:660-668) computed with the engine's rank-
    statistic auc; else the second element is None.
    """
    n_fold = len(predicts)
    out = df
    for k, p in enumerate(predicts):
        out = out.withColumn(f"prob_{k}", score_expr(out, p, list(feature_cols)))
    g = F.col(group_col)
    mean_prob = sum(
        (F.col(f"prob_{k}") for k in range(1, n_fold)), F.col("prob_0")
    ) / float(n_fold)
    final = F.when(g < 0, mean_prob)
    for k in range(n_fold):
        final = final.when(g == k, F.col(f"prob_{k}"))
    # a NULL group or group >= n_fold is caller error — raise_error
    # instead of a silent NULL prob that downstream AUC/KS would drop
    final = final.otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"stacking_evaluate: {group_col} out of range [-1, "),
                F.lit(f"{n_fold - 1}]: "),
                F.coalesce(g.cast("string"), F.lit("NULL")),
            )
        )
    )
    out = out.withColumn("prob", final).drop(*feature_cols)

    fold_auc = None
    if label_col is not None:
        from .metrics import auc as _auc

        train = out.where(g >= 0)
        rows = []
        for k in range(n_fold):
            rows.append(
                {
                    "fold": k,
                    "train_auc": _auc(
                        train.where(g != k), label_col, f"prob_{k}"
                    ),
                    "val_auc": _auc(
                        train.where(g == k), label_col, f"prob_{k}"
                    ),
                }
            )
        fold_auc = pd.DataFrame(rows)
    return out, fold_auc
