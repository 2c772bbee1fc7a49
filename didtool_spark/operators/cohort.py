"""Cohort retention analysis over per-key event streams.

"Of the users first seen in week W, what fraction was still active
N weeks later?" — the standard retention matrix, built scale-first:

- the stream reduces ONCE to the distinct (key, period) activity
  table (map-side-combined groupBy — the shuffle carries one row per
  key-period, never events);
- each key's cohort (first period) is a window min over that SAME
  aggregated table — one lineage, so the base is scanned exactly once
  (a groupBy-then-join-back shape would plan three base scans);
- cohort sizes need no extra pass: every key is active in its own
  first period, so the age-0 cell count IS the cohort size, broadcast
  back onto the tiny cell table.

Ages are calendar arithmetic on the truncated starts (datediff for
day/week, months_between for month) — exact in ANY session timezone,
including DST ones where date_trunc buckets are not fixed-width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cohort_retention"]


def cohort_retention(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """One row per (cohort_ts, age) with ``n_active``, ``n_cohort``
    and ``retention = n_active / n_cohort`` (round-trip exact: age 0
    always has retention 1.0 — every key is active in its own first
    period).  ``age`` counts whole periods since the key's first
    activity; grain in {"day", "week", "month"}.
    """
    if grain not in ("day", "week", "month"):
        raise ValueError(f"grain must be day/week/month, got {grain!r}")

    from pyspark.sql import Window

    active = (
        df.select(
            F.col(key).alias("k"),
            F.date_trunc(grain, F.col(ts_col)).alias("p"),
        )
        .groupBy("k", "p")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    j = active.withColumn(
        "cohort_ts", F.min("p").over(Window.partitionBy("k"))
    )
    if grain == "month":
        age = F.round(F.months_between("p", "cohort_ts")).cast("int")
    elif grain == "day":
        # calendar datediff, not epoch arithmetic: date_trunc buckets
        # are not fixed-width under a DST session timezone
        age = F.datediff("p", "cohort_ts").cast("int")
    else:
        age = (F.datediff("p", "cohort_ts") / F.lit(7)).cast("int")
    cells = (
        j.groupBy("cohort_ts", age.alias("age"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = (
        cells.where(F.col("age") == 0)
        .select("cohort_ts", F.col("n_active").alias("n_cohort"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_ts")
        .select(
            "cohort_ts", "age", "n_active", "n_cohort",
            (F.col("n_active") / F.col("n_cohort")).alias("retention"),
        )
    )
