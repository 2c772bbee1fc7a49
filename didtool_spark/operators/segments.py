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


def _lit_map(d: dict, cast_t: str):
    pairs = []
    for kk, vv in d.items():
        pairs += [F.lit(int(kk)), F.lit(vv).cast(cast_t)]
    return F.create_map(*pairs) if pairs else F.create_map()


def _driver_ranks(
    per: DataFrame,
    specs: Sequence[tuple[str, bool, str]],
    tiebreak: Sequence[str],
    sum_col: str | None,
    cum_name: str,
    total: int,
) -> DataFrame:
    """Bounded driver path for ``_global_ranks``: one Arrow collect of
    the per-entity table, exact ranks via numpy lexsort — replaces the
    percentile fit + bucket-stat collect + per-bucket windows (three
    jobs over the cached table) with one pull and one createDataFrame.
    Ordering mirrors the bucketed plan exactly: transformed value
    ascending (callers pre-negate for DESC), NULL/NaN values LAST
    ordered by the tiebreak alone, ranks 1..total as int64 (the
    bucketed path's long offsets + row_number).  The running
    ``cum_name`` is a sequential cumsum down the ranking — same
    6-decimal-rounded values as the bucketed offset+window
    decomposition (both already differ from a single sequential window
    only in float association; parity asserted bit-exact in
    tests/test_segments_driver.py)."""
    import numpy as np

    spark = per.sparkSession
    pdf = per.toPandas()
    n_rows = len(pdf)
    for i, (_c, _desc, name) in enumerate(specs):
        v = pdf[f"__v{i}"].to_numpy(dtype=np.float64, na_value=np.nan)
        nullf = np.isnan(v)
        vkey = np.where(nullf, 0.0, v)  # nulls ordered by tiebreak only
        tb = [pdf[t].to_numpy() for t in tiebreak]
        order = np.lexsort((*reversed(tb), vkey, nullf))
        rk = np.empty(n_rows, dtype=np.int64)
        rk[order] = np.arange(1, n_rows + 1)
        pdf[name] = rk
        if sum_col is not None and i == 0:
            sv = pdf[sum_col].to_numpy(dtype=np.float64, na_value=np.nan)
            sv = np.where(np.isnan(sv), 0.0, sv)
            cum = np.empty(n_rows, dtype=np.float64)
            cum[order] = np.cumsum(sv[order])
            pdf[cum_name] = cum
    pdf = pdf.drop(columns=[f"__v{i}" for i in range(len(specs))])
    return spark.createDataFrame(pdf)


def _global_ranks(
    per: DataFrame,
    specs: Sequence[tuple[str, bool, str]],
    tiebreak: Sequence[str],
    n_buckets: int = 64,
    approx: bool = False,
    sum_col: str | None = None,
    cum_name: str = "__cum",
    max_driver_rows: int | None = 8_000_000,
) -> tuple[DataFrame, int]:
    """Dense global ranks (one per spec ``(value_col, descending,
    rank_name)``) over one table in TWO driver actions total: one
    combined percentile fit, one combined bucket-stat collect via a
    metric-exploded groupBy.  NULL/NaN values rank LAST in either
    direction (both engines' SQL default): they take a dedicated
    bucket after every value bucket, ordered by the tiebreak alone.

    ``approx=True`` swaps the exact ``percentile`` fit for
    ``percentile_approx`` — the 100 TB path: exact percentile buffers
    every distinct value in the aggregation state, approx is
    fixed-memory; edges only PLACE the buckets (ranks are re-based by
    real per-bucket counts), so approximation costs balance, never
    correctness.  ``sum_col`` (single-spec callers like pareto_curve)
    additionally emits ``cum_name`` = the running sum down the first
    spec's ranking.
    """
    if sum_col is not None and len(specs) != 1:
        raise ValueError("sum_col requires exactly one spec")
    vs = []
    for i, (col, desc, _name) in enumerate(specs):
        v = F.col(col).cast("double")
        per = per.withColumn(f"__v{i}", (-v) if desc else v)
        vs.append(f"__v{i}")

    if max_driver_rows:
        # one count on the (caller-persisted) per-entity table gates
        # the bounded pull — the capped-collect-with-distributed-
        # fallback pattern (binning fits, connected_components,
        # pagerank).  A per-ENTITY table fits the cap far beyond the
        # raw stream scale that motivates the bucketed machinery.
        total = per.count()
        # 0 rows falls through: the empty frame keeps its Spark schema
        # on the bucketed path, while an empty pandas round-trip would
        # have to re-infer dtypes
        if 0 < total <= max_driver_rows:
            return (
                _driver_ranks(per, specs, tiebreak, sum_col, cum_name, total),
                total,
            )

    probs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    fit_fn = "percentile_approx" if approx else "percentile"
    fit_extra = ", 10000" if approx else ""
    row = per.agg(
        *[
            F.expr(f"{fit_fn}({v}, array({probs}){fit_extra})").alias(f"__e{i}")
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
            # NULLS LAST: dedicated bucket after every value bucket
            bin_expr(
                F.col(v),
                [-math.inf, *edges, math.inf],
                nan_value=len(edges) + 1,
            ),
        )

    sval = (
        F.coalesce(F.col(sum_col).cast("double"), F.lit(0.0))
        if sum_col is not None
        else F.lit(0.0)
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
            ).alias("s"),
            sval.alias("__sv"),
        )
        .groupBy(F.col("s.m").alias("m"), F.col("s.bk").alias("bk"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__sv").alias("sv"))
        .collect()
    )
    offs: list[dict[int, int]] = [dict() for _ in specs]
    soffs: dict[int, float] = {}
    for i in range(len(specs)):
        rows = sorted((r for r in stats if r["m"] == i), key=lambda r: r["bk"])
        c, cs = 0, 0.0
        for r in rows:
            offs[i][r["bk"]] = c
            c += r["n"]
            if sum_col is not None and i == 0:
                soffs[r["bk"]] = cs
                cs += r["sv"]

    for i, (_col, _desc, name) in enumerate(specs):
        w = Window.partitionBy(f"__bk{i}").orderBy(f"__v{i}", *tiebreak)
        per = per.withColumn(
            name,
            F.element_at(_lit_map(offs[i], "long"), F.col(f"__bk{i}"))
            + F.row_number().over(w),
        )
        if sum_col is not None and i == 0:
            per = per.withColumn(
                cum_name,
                F.element_at(_lit_map(soffs, "double"), F.col("__bk0"))
                + F.sum(sum_col).over(
                    w.rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
            )
    return per.drop(*vs, *[f"__bk{i}" for i in range(len(specs))]), total


def _global_rank(
    per: DataFrame,
    value_col: str,
    tiebreak: Sequence[str],
    descending: bool = False,
    n_buckets: int = 64,
    sum_col: str | None = None,
    rank_name: str = "__rank",
    cum_name: str = "__cum",
    approx: bool = False,
) -> tuple[DataFrame, int]:
    """Single-metric convenience wrapper over ``_global_ranks``."""
    return _global_ranks(
        per,
        [(value_col, descending, rank_name)],
        tiebreak,
        n_buckets=n_buckets,
        approx=approx,
        sum_col=sum_col,
        cum_name=cum_name,
    )


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
    approx: bool = False,
    eager_release: bool = True,
) -> DataFrame:
    """Per-entity RFM table: ``recency_days`` (days from last activity
    to ``asof``, default the corpus max date), ``frequency`` (rows),
    ``monetary`` (sum of ``amount_col``), NTILE scores 1..n (n = best:
    most recent / most frequent / highest spend) and a rule-based
    ``segment`` label.

    Scores replicate ``NTILE(n) OVER (ORDER BY recency_days DESC, key)``
    (resp. frequency/monetary ASC) — deterministic under ties via the
    key tiebreak, and exactly what the SQL oracle runs.

    The per-entity table is persisted while the ranks are fitted (one
    row per entity — bounded; it feeds the rank fit actions and the
    final plan), then released before return: the result is eagerly
    localCheckpoint()ed so it no longer depends on the cache, and the
    per-entity cache is unpersisted — repeated calls in a long-lived
    session do not accumulate cached relations (the pagerank pattern).
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
    # stream re-aggregates for every pass.  Keep a handle on the
    # EXACT persisted Dataset: unpersist matches on the logical plan,
    # so calling it on a frame later derived via withColumn/drop is a
    # silent no-op and the cache leaks (ADVICE r5)
    per = _cached = per.persist()

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
        approx=approx,
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
    out = per.select(
        "key", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score", seg.alias("segment"),
    )
    if eager_release:
        # eager checkpoint + unpersist: the result stops depending on
        # the per-entity cache, which is released immediately (ADVICE
        # r4).  eager_release=False keeps the lazy plan (composition /
        # plan inspection) — the caller owns the cache lifetime then.
        out = out.localCheckpoint(eager=True)
        _cached.unpersist()
    return out


def pareto_curve(
    df: DataFrame,
    key: str,
    amount_col: str,
    n_buckets: int = 64,
    approx: bool = False,
    eager_release: bool = True,
) -> DataFrame:
    """Revenue-concentration curve: per entity, its total, global rank
    by total DESC (key ASC tie-break), and the cumulative share of the
    grand total down the ranking — "the top x% of entities hold y% of
    the value".  ``cum_share``/``frac_keys`` are the curve's (y, x).
    """
    # feeds the rank fit action + the final plan twice; keep the exact
    # persisted Dataset for release (see rfm_segments / ADVICE r5)
    per = _cached = df.groupBy(F.col(key).alias("key")).agg(
        F.sum(amount_col).alias("amount")
    ).persist()
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
        approx=approx,
    )
    per = per.drop("__amt_q")
    grand = per.agg(F.sum("amount").alias("__g"))
    out = (
        per.crossJoin(F.broadcast(grand))
        .select(
            "key",
            "amount",
            F.col("rank").cast("long").alias("rank"),
            (F.col("__cum") / F.col("__g")).alias("cum_share"),
            (F.col("rank") / F.lit(float(total))).alias("frac_keys"),
        )
    )
    if eager_release:
        # see rfm_segments: release the per-entity cache before return
        out = out.localCheckpoint(eager=True)
        _cached.unpersist()
    return out
