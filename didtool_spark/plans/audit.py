"""Zero-temporal-leakage audit (north rule: no feature may read data
with ts strictly greater than its anchor).

The audit is differential, not static: corrupt every column of every
row strictly AFTER an anchor cut and assert the features at-or-before
the cut are bit-identical. A feature that peeks at the future cannot
survive this for arbitrary cuts. This is the distributed form of the
reference's fit-on-train-only discipline (model.py:167-171).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def corrupt_future(
    df: DataFrame,
    cut: Column,
    protect: Sequence[str] = ("conv_id", "turn_idx", "ts"),
    ts_col: str = "ts",
    ts_shift_seconds: int = 10,
) -> DataFrame:
    """Perturb every non-key column (and shift ts) on rows where ``cut``
    is false. Key/order columns are preserved so row identity survives;
    ts shifts forward (later), which can only move information further
    into the future."""
    out = df
    for c, dtype in df.dtypes:
        if c in protect:
            continue
        col = F.col(c)
        if dtype == "string":
            poison = F.concat(F.lit("__POISON__"), col)
        elif dtype in ("double", "float"):
            poison = col * 3.7 + 1e6
        elif dtype in ("int", "bigint", "smallint"):
            poison = col + F.lit(10_000_019)
        else:
            poison = col
        out = out.withColumn(c, F.when(cut, col).otherwise(poison))
    out = out.withColumn(
        ts_col,
        F.when(cut, F.col(ts_col)).otherwise(
            F.col(ts_col) + F.expr(f"INTERVAL {ts_shift_seconds} SECONDS")
        ),
    )
    return out


def audit_no_leakage(
    df: DataFrame,
    feature_fn: Callable[[DataFrame], DataFrame],
    cut: Column,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    ignore_cols: Sequence[str] = (),
) -> tuple[bool, list[str]]:
    """Run ``feature_fn`` on the original and future-corrupted inputs and
    compare feature values on at-or-before-cut rows. Returns
    (clean, offending_columns). Distributed comparison — no collect of
    the data, only the per-column mismatch counts."""
    base = feature_fn(df).where(cut)
    pert = feature_fn(corrupt_future(df, cut)).where(cut)

    keys = list(key_cols)
    feat_cols = [
        c for c in base.columns if c not in set(keys) | set(ignore_cols)
    ]
    a = base.select(*keys, *[F.col(c).alias(f"a_{c}") for c in feat_cols])
    b = pert.select(*keys, *[F.col(c).alias(f"b_{c}") for c in feat_cols])
    j = a.join(b, keys, "full_outer")
    checks = [
        F.sum(
            (
                ~(
                    (F.col(f"a_{c}") == F.col(f"b_{c}"))
                    | (F.col(f"a_{c}").isNull() & F.col(f"b_{c}").isNull())
                )
            ).cast("int")
        ).alias(c)
        for c in feat_cols
    ]
    row = j.select(*checks).first()
    offenders = [c for c in feat_cols if (row[c] or 0) > 0]
    return (not offenders, offenders)
