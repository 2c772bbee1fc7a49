"""Declarative data-quality checks (expectations) over a DataFrame —
the validation gate a production feature pipeline runs before
training or serving.

Reference parity: didtool validates inputs ad hoc (assertions sprinkled
through transformer.py); pipeline engines make the checks declarative
(Deequ / Great Expectations style) so they can run as a single job and
block a checkpoint on failure.  This module implements that pattern
Spark-first.

Scale design: EVERY rule compiles to aggregate expressions over ONE
shared scan — a single ``df.agg(...)`` job computes all metrics
(null rates, ranges, distinct counts, accepted-value violations,
row count), so adding rules never adds passes.  Uniqueness uses
``count - approx/exact count_distinct`` on the rule's columns.  The
result is a tiny (rule, column, metric, threshold, passed) frame a
checkpoint hook can assert on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "not_null",
    "in_range",
    "accepted_values",
    "unique",
    "min_rows",
    "validate",
]


def not_null(col: str, max_null_rate: float = 0.0) -> dict:
    """Null rate of ``col`` must be <= max_null_rate."""
    return {"rule": "not_null", "column": col, "threshold": float(max_null_rate)}


def in_range(col: str, lo: float, hi: float, max_violation_rate: float = 0.0) -> dict:
    """Fraction of non-NULL values outside [lo, hi] must be <=
    max_violation_rate."""
    return {
        "rule": "in_range", "column": col, "lo": float(lo), "hi": float(hi),
        "threshold": float(max_violation_rate),
    }


def accepted_values(col: str, values: Sequence, max_violation_rate: float = 0.0) -> dict:
    """Fraction of non-NULL values outside ``values`` must be <=
    max_violation_rate."""
    return {
        "rule": "accepted_values", "column": col, "values": list(values),
        "threshold": float(max_violation_rate),
    }


def unique(cols: Sequence[str] | str, exact: bool = True) -> dict:
    """``cols`` must be a unique key (duplicate rate == 0).
    ``exact=False`` uses approx_count_distinct (HLL sketch) — the 100TB
    path, with its documented ~2% relative error."""
    cols_l = [cols] if isinstance(cols, str) else list(cols)
    return {"rule": "unique", "column": ",".join(cols_l), "cols": cols_l,
            "threshold": 0.0, "exact": exact}


def min_rows(n: int) -> dict:
    """Row count must be >= n."""
    return {"rule": "min_rows", "column": "*", "threshold": float(n)}


def _metric_expr(r: dict, total: Column) -> Column:
    if r["rule"] == "not_null":
        return (total - F.count(F.col(r["column"]))) / total
    if r["rule"] == "in_range":
        v = F.col(r["column"]).cast("double")
        bad = F.sum(
            ((v < F.lit(r["lo"])) | (v > F.lit(r["hi"]))).cast("long")
        )
        return F.coalesce(bad / F.count(v), F.lit(0.0))
    if r["rule"] == "accepted_values":
        c = F.col(r["column"])
        bad = F.sum((~c.isin(*r["values"])).cast("long"))
        return F.coalesce(bad / F.count(c), F.lit(0.0))
    if r["rule"] == "unique":
        cnt = (
            F.count_distinct(*[F.col(c) for c in r["cols"]])
            if r.get("exact", True)
            else F.approx_count_distinct(F.concat_ws("\x1f", *r["cols"]))
        )
        return (total - cnt) / total
    if r["rule"] == "min_rows":
        return total.cast("double")
    raise ValueError(f"unknown rule {r['rule']!r}")


def validate(df: DataFrame, rules: Sequence[dict]) -> DataFrame:
    """Run every rule in ONE aggregation job over ONE scan.

    Returns ``(rule, column, metric, threshold, passed)`` — rates for
    the rate rules (passed = metric <= threshold), the row count for
    ``min_rows`` (passed = metric >= threshold).
    """
    rules = list(rules)
    if not rules:
        raise ValueError("no rules given")
    total = F.count(F.lit(1))
    row = df.agg(
        *[_metric_expr(r, total).alias(f"m{i}") for i, r in enumerate(rules)]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(r["rule"]).alias("rule"),
                F.lit(r["column"]).alias("column"),
                F.col(f"m{i}").cast("double").alias("metric"),
                F.lit(r["threshold"]).alias("threshold"),
                (
                    (F.col(f"m{i}") >= F.lit(r["threshold"]))
                    if r["rule"] == "min_rows"
                    else (F.col(f"m{i}") <= F.lit(r["threshold"]))
                ).alias("passed"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return row.select(F.explode(pairs).alias("r")).select(
        "r.rule", "r.column", "r.metric", "r.threshold", "r.passed"
    )
