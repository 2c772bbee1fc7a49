"""Leakage-safe temporal cross-validation splits: expanding-window
(rolling-origin) folds and purged K-fold with embargo.

Reference parity: didtool's split.py splits by a precomputed group
column or random hash — fine for i.i.d. rows, leakage-prone for time
series (a random split trains on the future of its own test rows).
The standard fixes are (a) rolling-origin evaluation: train on
everything strictly before the fold's window, test on the window; and
(b) purged K-fold (López de Prado 2018): contiguous time folds where
training rows inside an ``embargo`` of the test window are DROPPED, so
label horizons that straddle the boundary cannot leak.

Scale design: both operators are pure row expressions over the
timestamp — fold edges come from one exact/approx percentile fit
(O(n_folds) literals), and every row's (fold, role) label is codegen
against those literals.  No shuffle, no window, no Python; the output
composes with groupBy("fold") training loops or the selector/model
stack unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rolling_origin_folds", "purged_kfold"]


def _edges(df: DataFrame, ts_col: str, n_folds: int, approx: bool) -> list[float]:
    """Interior time edges at equal-count quantiles (epoch micros)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    probs = [i / n_folds for i in range(1, n_folds)]
    pct = F.approx_percentile if approx else F.percentile
    row = df.select(
        pct(us, F.array(*[F.lit(p) for p in probs])).alias("e")
    ).collect()[0]["e"]
    if row is None:
        raise ValueError(f"no non-NULL {ts_col!r} values to fit fold edges")
    return [float(e) for e in row]


def rolling_origin_folds(
    df: DataFrame,
    n_folds: int = 5,
    ts_col: str = "ts",
    min_train_folds: int = 1,
    approx: bool = False,
) -> DataFrame:
    """Expanding-window evaluation splits: time is cut into ``n_folds``
    equal-count segments; segment ``k`` is fold ``k``'s TEST window and
    everything strictly earlier is its TRAIN set.

    Adds ``segment`` (0..n_folds-1, which time slice the row is in) and
    ``test_fold`` (= segment; NULL for segments below
    ``min_train_folds`` — those are never tested, only trained on).
    A training loop is then ``for k: train = segment < k,
    test = segment == k`` — every feature fit sees only the past.
    Pure literal-comparison expressions; one percentile fit.
    """
    edges = _edges(df, ts_col, n_folds, approx)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    seg = F.lit(0)
    for e in edges:
        seg = seg + (us >= F.lit(e)).cast("int")
    out = df.withColumn("segment", seg.cast("int"))
    return out.withColumn(
        "test_fold",
        F.when(F.col("segment") >= min_train_folds, F.col("segment")),
    )


def purged_kfold(
    df: DataFrame,
    n_folds: int = 5,
    ts_col: str = "ts",
    embargo_s: float = 0.0,
    approx: bool = False,
) -> DataFrame:
    """Purged K-fold with embargo: contiguous time folds; for each test
    fold ``k``, training rows within ``embargo_s`` seconds of fold
    ``k``'s window are PURGED (a label computed over a forward horizon
    near the boundary would otherwise leak across it).

    Adds ``fold`` (the row's own time segment) and, per fold ``k``,
    ``train_{k}`` (boolean: usable for training when fold ``k`` is the
    test set — outside the fold AND outside its embargo).  All columns
    are literal comparisons on the row's timestamp; callers with wide
    label horizons should set ``embargo_s`` >= their horizon.
    """
    edges = _edges(df, ts_col, n_folds, approx)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    seg = F.lit(0)
    for e in edges:
        seg = seg + (us >= F.lit(e)).cast("int")
    out = df.withColumn("fold", seg.cast("int"))
    emb_us = float(embargo_s) * 1e6
    bounds = [float("-inf")] + edges + [float("inf")]
    for k in range(n_folds):
        lo, hi = bounds[k], bounds[k + 1]
        inside = F.col("fold") == k
        near = F.lit(False)
        if emb_us > 0:
            if lo != float("-inf"):
                near = near | (
                    (us >= F.lit(lo - emb_us)) & (us < F.lit(lo))
                )
            if hi != float("inf"):
                near = near | (
                    (us >= F.lit(hi)) & (us < F.lit(hi + emb_us))
                )
        out = out.withColumn(f"train_{k}", ~inside & ~near)
    return out
