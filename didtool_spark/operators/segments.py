"""Entity-value segmentation: RFM scores and Pareto concentration.

Both start from the same reduction — the raw stream collapses ONCE to
a per-entity aggregate row (map-side-combined groupBy) — and then
need a GLOBAL rank over that table.  ``Window.orderBy`` without
partitions is the single-partition sort this repo bans, so ranks come
from a bucketed decomposition instead (``_global_rank``):

1. fit: one tiny aggregation collects ``n_buckets - 1`` exact
   percentile edges of the rank value (plus the row count / value
   total) to the driver — the binning operators' collect-capped fit
   shape;
2. rows bucket by edge comparison (functions/binexpr.bin_expr — pure
   codegen), rank within a bucket by ``row_number`` over the
   per-bucket window, and re-base by an exclusive running offset over
   the <= n_buckets-row bucket-stats table;
3. ties sit entirely inside one bucket (equal values compare equal to
   every edge), so bucket-major order IS the global order.

No task ever sorts more than ~1/n_buckets of the entities; the only
driver state is the edge list.  The same machinery yields the global
cumulative sum for the Pareto curve.

``rfm_segments`` reproduces SQL ``NTILE(n) OVER (ORDER BY metric
[DESC], key)`` *exactly* (first ``N % n`` tiles one row larger), so
the DuckDB oracle replays it with the builtin.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.binexpr import bin_expr

__all__ = ["rfm_segments", "pareto_curve"]


def _global_rank(
    per: DataFrame,
    value_col: str,
    tiebreak: Sequence[str],
    descending: bool = False,
    n_buckets: int = 64,
    sum_col: str | None = None,
    rank_name: str = "__rank",
    cum_name: str = "__cum",
) -> tuple[DataFrame, int]:
    """Dense global ``row_number`` over (value, *tiebreak) without a
    single-partition sort.  Returns (df + rank [+ cumulative sum of
    ``sum_col``], total row count)."""
    v = F.col(value_col).cast("double")
    v = (-v) if descending else v
    per = per.withColumn("__v", v)

    probs = [i / n_buckets for i in range(1, n_buckets)]
    aggs = [
        F.expr(
            f"percentile(__v, array({', '.join(str(p) for p in probs)}))"
        ).alias("__edges"),
        F.count(F.lit(1)).alias("__n"),
    ]
    row = per.agg(*aggs).first()
    edges = sorted({float(e) for e in (row["__edges"] or []) if e is not None})
    total = int(row["__n"])

    b = per.withColumn(
        "__bk", bin_expr(F.col("__v"), [-math.inf, *edges, math.inf], nan_value=0)
    )
    w_in = Window.partitionBy("__bk").orderBy("__v", *tiebreak)
    b = b.withColumn("__rn", F.row_number().over(w_in))
    if sum_col is not None:
        b = b.withColumn(
            "__cs",
            F.sum(sum_col).over(
                w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )

    stats = b.groupBy("__bk").agg(
        F.count(F.lit(1)).alias("__bn"),
        *([F.sum(sum_col).alias("__bs")] if sum_col is not None else []),
    )
    # exclusive running offsets over the <= n_buckets-row stats table:
    # a single-partition window over a bounded-by-construction input
    woff = (
        Window.partitionBy(F.lit(1))
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stats = stats.withColumn("__on", F.sum("__bn").over(woff) - F.col("__bn"))
    if sum_col is not None:
        stats = stats.withColumn(
            "__os", F.sum("__bs").over(woff) - F.col("__bs")
        )
    keep = ["__bk", "__on"] + (["__os"] if sum_col is not None else [])
    b = b.join(F.broadcast(stats.select(*keep)), "__bk")
    b = b.withColumn(rank_name, F.col("__on") + F.col("__rn"))
    if sum_col is not None:
        b = b.withColumn(cum_name, F.col("__os") + F.col("__cs"))
    drop = ["__v", "__bk", "__rn", "__on"] + (
        ["__cs", "__os"] if sum_col is not None else []
    )
    return b.drop(*drop), total


def _ntile_from_rank(rank: Column, total: int, n: int) -> Column:
    """SQL NTILE(n) from a dense 1..total rank: the first total % n
    tiles take ceil(total/n) rows, the rest floor(total/n)."""
    q, r = divmod(int(total), int(n))
    if q == 0:
        return rank.cast("int")
    big = r * (q + 1)
    return (
        F.when(rank <= big, F.ceil(rank / F.lit(q + 1)))
        .otherwise(F.lit(r) + F.ceil((rank - F.lit(big)) / F.lit(q)))
        .cast("int")
    )


def rfm_segments(
    df: DataFrame,
    key: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n: int = 5,
    asof: str | None = None,
) -> DataFrame:
    """Per-entity RFM table: ``recency_days`` (days from last activity
    to ``asof``, default the corpus max date), ``frequency`` (rows),
    ``monetary`` (sum of ``amount_col``), NTILE scores 1..n (n = best:
    most recent / most frequent / highest spend) and a rule-based
    ``segment`` label.

    Scores replicate ``NTILE(n) OVER (ORDER BY recency_days DESC, key)``
    (resp. frequency/monetary ASC) — deterministic under ties via the
    key tiebreak, and exactly what the SQL oracle runs.
    """
    per = df.groupBy(F.col(key).alias("key")).agg(
        F.max(ts_col).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(amount_col).alias("monetary"),
    )
    if asof is None:
        # corpus max date: aggregate of the per-entity maxima (tiny)
        mx = per.agg(F.max("__last").alias("__asof"))
        per = per.crossJoin(F.broadcast(mx))
        per = per.withColumn(
            "recency_days", F.datediff(F.col("__asof"), F.col("__last"))
        ).drop("__asof")
    else:
        per = per.withColumn(
            "recency_days",
            F.datediff(F.lit(asof).cast("timestamp"), F.col("__last")),
        )
    per = per.drop("__last")

    # rank monetary on whole cents: a float SUM's partial-aggregation
    # order differs between engines (and between runs at different
    # parallelism), and an ulp difference must not be able to swap two
    # near-equal entities' ranks; displayed monetary stays exact
    per = per.withColumn(
        "__mon_q",
        F.floor(F.col("monetary") * 100 + F.lit(0.5)).cast("long"),
    )
    per, total = _global_rank(
        per, "recency_days", ["key"], descending=True, rank_name="__rk_r"
    )
    per, _ = _global_rank(per, "frequency", ["key"], rank_name="__rk_f")
    per, _ = _global_rank(per, "__mon_q", ["key"], rank_name="__rk_m")
    per = per.drop("__mon_q")
    per = (
        per.withColumn("r_score", _ntile_from_rank(F.col("__rk_r"), total, n))
        .withColumn("f_score", _ntile_from_rank(F.col("__rk_f"), total, n))
        .withColumn("m_score", _ntile_from_rank(F.col("__rk_m"), total, n))
        .drop("__rk_r", "__rk_f", "__rk_m")
    )
    hi, lo = n - 1, 2  # >= hi: strong; <= lo: weak (classic 5-tile rules)
    seg = (
        F.when(
            (F.col("r_score") >= hi)
            & (F.col("f_score") >= hi)
            & (F.col("m_score") >= hi),
            "champion",
        )
        .when(
            (F.col("r_score") <= lo) & (F.col("f_score") >= hi), "at_risk"
        )
        .when(
            (F.col("r_score") <= lo) & (F.col("f_score") <= lo), "hibernating"
        )
        .when(F.col("f_score") >= hi, "loyal")
        .when(F.col("m_score") >= hi, "big_spender")
        .when(F.col("r_score") >= hi, "recent")
        .otherwise("regular")
    )
    return per.select(
        "key", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score", seg.alias("segment"),
    )


def pareto_curve(
    df: DataFrame,
    key: str,
    amount_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Revenue-concentration curve: per entity, its total, global rank
    by total DESC (key ASC tie-break), and the cumulative share of the
    grand total down the ranking — "the top x% of entities hold y% of
    the value".  ``cum_share``/``frac_keys`` are the curve's (y, x).
    """
    per = df.groupBy(F.col(key).alias("key")).agg(
        F.sum(amount_col).alias("amount")
    )
    # rank on whole cents (see rfm_segments) so engine-order float
    # summation cannot reorder near-equal entities
    per = per.withColumn(
        "__amt_q", F.floor(F.col("amount") * 100 + F.lit(0.5)).cast("long")
    )
    per, total = _global_rank(
        per,
        "__amt_q",
        ["key"],
        descending=True,
        n_buckets=n_buckets,
        sum_col="amount",
        rank_name="rank",
        cum_name="__cum",
    )
    per = per.drop("__amt_q")
    grand = per.agg(F.sum("amount").alias("__g"))
    return (
        per.crossJoin(F.broadcast(grand))
        .select(
            "key",
            "amount",
            F.col("rank").cast("long").alias("rank"),
            (F.col("__cum") / F.col("__g")).alias("cum_share"),
            (F.col("rank") / F.lit(float(total))).alias("frac_keys"),
        )
    )
