"""Survival-curve estimation over right-censored durations.

Consumes exactly what labels.with_time_to_event emits — a duration
plus an observed/censored flag per subject — and estimates the
Kaplan-Meier product-limit survival curve, optionally per group
(treatment arm, segment, model version):

    S(t) = prod_{t_i <= t} (1 - d_i / n_i)

with d_i = events at distinct duration t_i and n_i = subjects still
at risk just before t_i.  Standard error comes from Greenwood's
formula: var(S) = S^2 * sum d_i / (n_i * (n_i - d_i)).

Scale design: the raw table reduces ONCE to per-(group, duration)
(d_i, c_i) counts — a map-side-combined groupBy whose shuffle carries
one row per distinct duration, never subjects.  Everything after runs
on that aggregated table: n_i is the group total minus an exclusive
running sum, and the cumulative product is exp(cumsum(log)) guarded
by a window min for exact zeros (log1p/expm1 would lose nothing here:
factors are bounded away from 1 only at tiny n_i, where round-6
output absorbs the difference).  The per-group window sorts distinct
durations only — bounded by the duration resolution, not the corpus.
Censored-only durations still consume at-risk mass (n_i drops) but
contribute no factor, the textbook treatment.

Oracle: the whole estimator is windowed SQL — DuckDB replays it
verbatim (plans/demo_queries.py SQL_KAPLAN_MEIER).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kaplan_meier"]


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    group_cols: Sequence[str] | str | None = None,
) -> DataFrame:
    """One row per (group, distinct duration): ``n_risk``, ``n_event``,
    ``n_censor``, ``survival`` and Greenwood ``std_err``.

    ``observed_col`` is boolean (TRUE = the event happened at
    ``duration_col``; FALSE = right-censored there).  NULL durations
    are dropped (no information).  ``survival`` is the curve value AT
    the duration (events at t are already applied); a duration where
    every remaining subject dies yields an exact 0.0, not exp(-inf).
    """
    if group_cols is None:
        gl: list[str] = []
    elif isinstance(group_cols, str):
        gl = [group_cols]
    else:
        gl = list(group_cols)

    cells = (
        df.where(F.col(duration_col).isNotNull())
        .groupBy(*gl, F.col(duration_col).alias("duration"))
        .agg(
            F.sum(F.col(observed_col).cast("long")).alias("n_event"),
            F.sum((~F.col(observed_col)).cast("long")).alias("n_censor"),
        )
    )
    wall = Window.partitionBy(*gl) if gl else Window.partitionBy(F.lit(1))
    wcum = (
        (Window.partitionBy(*gl) if gl else Window.partitionBy(F.lit(1)))
        .orderBy("duration")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum(F.col("n_event") + F.col("n_censor")).over(wall)
    left_before = (
        F.sum(F.col("n_event") + F.col("n_censor")).over(wcum)
        - F.col("n_event")
        - F.col("n_censor")
    )
    cells = cells.withColumn("n_risk", total - left_before)

    factor = 1.0 - F.col("n_event") / F.col("n_risk")
    hit_zero = F.min(factor).over(wcum) <= F.lit(0.0)
    # the log term is guarded on n_risk > n_event as well: the
    # everyone-dies duration has factor 0 — ln would be -inf (NULL in
    # Spark, an error in DuckDB) — and hit_zero already pins the curve
    log_surv = F.sum(
        F.when(
            (F.col("n_event") > 0) & (F.col("n_risk") > F.col("n_event")),
            F.log(factor),
        ).otherwise(F.lit(0.0))
    ).over(wcum)
    # Greenwood accumulates d / (n * (n - d)); at the zero-survival
    # duration the denominator is 0 — the variance of an exact 0 curve
    # is conventionally reported as NULL from there on
    green = F.sum(
        F.when(
            (F.col("n_event") > 0) & (F.col("n_risk") > F.col("n_event")),
            F.col("n_event")
            / (F.col("n_risk") * (F.col("n_risk") - F.col("n_event"))),
        ).otherwise(F.lit(0.0))
    ).over(wcum)

    surv = F.when(hit_zero, F.lit(0.0)).otherwise(F.exp(log_surv))
    std = F.when(hit_zero, F.lit(None).cast("double")).otherwise(
        F.exp(log_surv) * F.sqrt(green)
    )
    return cells.select(
        *gl,
        "duration",
        "n_risk",
        "n_event",
        "n_censor",
        surv.alias("survival"),
        std.alias("std_err"),
    )
