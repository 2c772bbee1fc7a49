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

    # exclusive running offsets over the <= n_buckets bucket stats:
    # collected to the driver (it is fit-sized state, like the edges)
    # and inlined as a literal bucket -> offset map — one pure
    # expression instead of a single-partition window + broadcast
    # join, which cost two extra exchanges per rank pass
    stats = (
        b.groupBy("__bk")
        .agg(
            F.count(F.lit(1)).alias("__bn"),
            *([F.sum(sum_col).alias("__bs")] if sum_col is not None else []),
        )
        .collect()
    )
    stats.sort(key=lambda r: r["__bk"])
    off_n: dict[int, int] = {}
    off_s: dict[int, float] = {}
    cn, cs = 0, 0.0
    for r in stats:
        off_n[r["__bk"]] = cn
        cn += r["__bn"]
        if sum_col is not None:
            off_s[r["__bk"]] = cs
            cs += r["__bs"]

    def lit_map(d, cast_t):
        pairs = []
        for kk, vv in d.items():
            pairs += [F.lit(int(kk)), F.lit(vv).cast(cast_t)]
        return F.create_map(*pairs) if pairs else F.create_map()

    b = b.withColumn(
        rank_name,
        F.element_at(lit_map(off_n, "long"), F.col("__bk"))
        + F.col("__rn"),
    )
    if sum_col is not None:
        b = b.withColumn(
            cum_name,
            F.element_at(lit_map(off_s, "double"), F.col("__bk"))
            + F.col("__cs"),
        )
    drop = ["__v", "__bk", "__rn"] + (["__cs"] if sum_col is not None else [])
    return b.drop(*drop), total


def _global_ranks(
    per: DataFrame,
    specs: Sequence[tuple[str, bool, str]],
    tiebreak: Sequence[str],
    n_buckets: int = 64,
) -> tuple[DataFrame, int]:
    """Several dense global ranks over one table in TWO driver actions
    total (one combined percentile fit, one combined bucket-stat
    collect via a metric-exploded groupBy) — the multi-metric form of
    ``_global_rank`` for callers like RFM that rank the same rows
    three ways; per-metric actions would pay the job overhead 2x per
    metric."""
    vs = []
    for i, (col, desc, _name) in enumerate(specs):
        v = F.col(col).cast("double")
        per = per.withColumn(f"__v{i}", (-v) if desc else v)
        vs.append(f"__v{i}")

    probs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    row = per.agg(
        *[
            F.expr(f"percentile({v}, array({probs}))").alias(f"__e{i}")
            for i, v in enumerate(vs)
        ],
        F.count(F.lit(1)).alias("__n"),
    ).first()
    total = int(row["__n"])
    for i, v in enumerate(vs):
        edges = sorted(
            {float(e) for e in (row[f"__e{i}"] or []) if e is not None}
        )
        per = per.withColumn(
            f"__bk{i}",
            bin_expr(F.col(v), [-math.inf, *edges, math.inf], nan_value=0),
        )

    stats = (
        per.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("m"), F.col(f"__bk{i}").alias("bk")
                        )
                        for i in range(len(specs))
                    ]
                )
            ).alias("s")
        )
        .groupBy(F.col("s.m").alias("m"), F.col("s.bk").alias("bk"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offs: list[dict[int, int]] = [dict() for _ in specs]
    for i in range(len(specs)):
        rows = sorted((r for r in stats if r["m"] == i), key=lambda r: r["bk"])
        c = 0
        for r in rows:
            offs[i][r["bk"]] = c
            c += r["n"]

    for i, (_col, _desc, name) in enumerate(specs):
        w = Window.partitionBy(f"__bk{i}").orderBy(f"__v{i}", *tiebreak)
        pairs = []
        for kk, vv in offs[i].items():
            pairs += [F.lit(int(kk)), F.lit(vv).cast("long")]
        omap = F.create_map(*pairs) if pairs else F.create_map()
        per = per.withColumn(
            name,
            F.element_at(omap, F.col(f"__bk{i}")) + F.row_number().over(w),
        )
    return per.drop(*vs, *[f"__bk{i}" for i in range(len(specs))]), total


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
    # the per-entity table feeds three rank fits (each an eager
    # percentile action) plus the final plan — persist or the raw
    # stream re-aggregates for every pass
    per = per.persist()

    # rank monetary on whole cents: a float SUM's partial-aggregation
    # order differs between engines (and between runs at different
    # parallelism), and an ulp difference must not be able to swap two
    # near-equal entities' ranks; displayed monetary stays exact
    per = per.withColumn(
        "__mon_q",
        F.floor(F.col("monetary") * 100 + F.lit(0.5)).cast("long"),
    )
    per, total = _global_ranks(
        per,
        [
            ("recency_days", True, "__rk_r"),
            ("frequency", False, "__rk_f"),
            ("__mon_q", False, "__rk_m"),
        ],
        tiebreak=["key"],
    )
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
    ).persist()  # feeds the rank fit action + the final plan twice
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
