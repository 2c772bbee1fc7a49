"""Table profiling, deterministic per-group sampling, and join-key
skew diagnostics.

Operating a feature pipeline at 100 TB starts with three questions the
engine should answer about any table cheaply: what is in each column
(profile_table), give me a reproducible slice of each group to look at
(group_sample), and is this join/groupBy key skewed enough to need the
bucketed/salted strategies (skew_stats — the measurement that decides
between didtool_spark's ``strategy="window"`` and
``strategy="bucketed"`` operator forms).

All three are single-aggregation-pass plans over melted or keyed
frames; none collects row-scale data to the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-column profile: row count, null count/fraction, exact
    distinct count, most frequent value and its count, lexicographic
    min/max of the string form.

    Plan (the iv_all melted shape): every column is cast to string and
    melted into ONE (column, value) stream, so a single map-side
    combined groupBy(column, value) covers the whole profile — the
    shuffle carries one row per distinct (column, value) cell, never
    one per input row. Distinct/null/top/min/max are then aggregates
    over that (small) cell table; the top value uses max_by over the
    cell counts (deterministic: count desc, value asc tie-break).

    min/max are on the STRING form (lexicographic) so one plan serves
    every type; use typed aggregates downstream where numeric ordering
    matters.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.column", "m.val")
    cells = melted.groupBy("column", "val").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        cells.groupBy("column")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("val").isNull(), F.col("cnt"))), F.lit(0)
            ).alias("n_null"),
            F.count(F.when(F.col("val").isNotNull(), F.lit(1))).alias(
                "n_distinct"
            ),
            # max_by with a (cnt, reversed-val) struct would need an
            # orderable inverse string; a deterministic min over the
            # (negated count, value) struct does the same job exactly
            F.min(
                F.when(
                    F.col("val").isNotNull(),
                    F.struct((-F.col("cnt")).alias("neg"), F.col("val").alias("v")),
                )
            ).alias("__top"),
            F.min("val").alias("min_str"),
            F.max("val").alias("max_str"),
        )
        .select(
            "column",
            "n_rows",
            "n_null",
            F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_frac"),
            "n_distinct",
            F.col("__top.v").alias("top_value"),
            (-F.col("__top.neg")).alias("top_count"),
            "min_str",
            "max_str",
        )
    )


def group_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic k-rows-per-group sample: rows are ordered inside
    each group by md5(id + seed) — a reproducible pseudo-random
    shuffle independent of partitioning — and the first ``k`` kept.

    Unlike ``DataFrame.sample`` (per-partition Bernoulli whose output
    changes with the partition layout and gives no per-group
    guarantee), this yields exactly min(k, |group|) rows per group on
    any cluster size. Spark plans the rank-filter as WindowGroupLimit:
    each map task keeps only its local top-k per group BEFORE the
    exchange, so a hot group never ships more than k rows per task.
    """
    order = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f"#{int(seed)}"))
    )
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(k))
        .drop("__rk")
    )


def weighted_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
    weight_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per
    group (Efraimidis-Spirakis A-ES, IPL 2006): each row draws a
    reproducible uniform u from md5(id + seed) and ranks by
    ln(u) / w — the top-k under that key is exactly a w-proportional
    without-replacement draw.  Same determinism story as group_sample
    (partition-layout independent; any cluster size reproduces the
    sample) and the same WindowGroupLimit bound: a hot group ships at
    most k rows per map task.

    Rows with NULL or non-positive weight are excluded (they have no
    defined inclusion probability).  ln(u)/w keeps the key in a
    numerically safe range where the textbook u^(1/w) underflows for
    tiny weights; the ordering is identical (ln is monotone, w > 0).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"), F.lit(f"#{int(seed)}")
                    )
                ),
                1, 15,
            ),
            16, 10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**60 + 1))
    key = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(group_col).orderBy(
        key.desc(), F.col(id_col).asc()
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(k))
        .drop("__rk")
    )


def skew_stats(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Join/groupBy-key skew report: the ``top_k`` heaviest keys with
    count, share of all rows, and skew factor (count / mean count per
    key) — the measurement that decides whether a key needs salting or
    the bucketed operator strategies (skew factor ~1 = uniform; a key
    holding x% of a 1000-task stage serializes x% of it).

    Plan: ONE map-side-combined groupBy(key) count (shuffle carries one
    row per distinct key), a scalar (n_rows, n_keys) aggregate of that
    table broadcast back, and a top-k via TakeOrderedAndProject — no
    global sort, nothing row-scale on the driver.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").cast("double").alias("__total"),
        F.count(F.lit(1)).cast("double").alias("__n_keys"),
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        counts.join(F.broadcast(totals))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(int(top_k))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("cnt") / (F.col("__total") / F.col("__n_keys")), 6
            ).alias("skew_factor"),
            F.row_number().over(w).alias("rank"),
        )
    )
