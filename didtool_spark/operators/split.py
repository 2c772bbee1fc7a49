"""Dataset splitting (reference didtool/split.py).

The group/fold assignment is A COLUMN, not separate frames — the
reference's key design (split.py:6-36), kept here. Random splits use
deterministic ``xxhash64(key, seed)`` buckets instead of sklearn
shuffles: reproducible across cluster sizes and repartitioning, which
``DataFrame.randomSplit`` (partition-dependent) is not. Proportions are
exact in expectation; the reference's exact-row-count shuffle split is
a documented divergence (impossible to reproduce distributively without
a global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

GROUP_COL = "group"


def split_data(
    df: DataFrame, train_mask: Column, val_mask: Column, group_col: str = GROUP_COL
) -> DataFrame:
    """split.py:6-36: 0=train, 1=val, -1=test from boolean conditions
    (val wins where both masks are true, matching the reference's
    sequential .loc assignment order: the val assignment is applied
    last and overwrites train)."""
    return df.withColumn(
        group_col,
        F.when(val_mask, F.lit(1)).when(train_mask, F.lit(0)).otherwise(F.lit(-1)),
    )


def _hash_unit(key_cols: list[str], seed: int) -> Column:
    """Deterministic U(0,1) per row from xxhash64 of the key columns."""
    h = F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000)).cast("double") / 1_000_000.0)


def split_data_random(
    df: DataFrame,
    train_size: float = 0.6,
    val_size: float = 0.2,
    group_col: str = GROUP_COL,
    key_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """split.py:39-92 semantics with deterministic hashing. ``key_cols``
    default to all input columns (row-content hash)."""
    if not 0 < train_size < 1:
        raise ValueError("train_size should be in range (0.0, 1.0)")
    if not 0 < val_size < 1:
        raise ValueError("val_size should be in range (0.0, 1.0)")
    if train_size + val_size > 1.0:
        raise ValueError("train_size + val_size should not be greater than 1.0")
    keys = key_cols or df.columns
    u = _hash_unit(keys, seed)
    return df.withColumn(
        group_col,
        F.when(u < train_size, F.lit(0))
        .when(u < train_size + val_size, F.lit(1))
        .otherwise(F.lit(-1)),
    )


def split_data_stacking(
    df: DataFrame,
    oot_mask: Column,
    n_fold: int = 5,
    group_col: str = GROUP_COL,
    key_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """split.py:95-141: oot -> -1; remaining rows -> fold ids 0..k-1
    (deterministic hash folds instead of KFold shuffle)."""
    keys = key_cols or df.columns
    h = F.xxhash64(*[F.col(c) for c in keys], F.lit(seed))
    return df.withColumn(
        group_col,
        F.when(oot_mask, F.lit(-1)).otherwise(F.pmod(h, F.lit(n_fold)).cast("int")),
    )
