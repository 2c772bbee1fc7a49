"""Distributed binning / discretization (reference didtool/cut.py).

fit = one Spark aggregation -> small edge list on the driver;
transform = generated right-closed CASE/comparison expression
(functions.binexpr.bin_expr) — no UDF, no shuffle, codegen-friendly.

Methods and exact semantics (reference file:line):
- step      cut.py:15-66   equal-width pd.cut edges + empty-bin merge
- quantile  cut.py:69-104  pd.qcut (linear-interp percentiles, dup-drop)
- dt        cut.py:107-161 sklearn CART thresholds (driver_fit.cart_thresholds)
- lgb       cut.py:164-231 single LightGBM tree (driver_fit.lgb_thresholds)
- chi       cut.py:253-354 ChiMerge (driver_fit.chimerge_edges)
NaN/NULL -> bin -1 in every method (cut.py:60-61 etc.); supervised fits
use non-null x only (cut.py:146-147, 197, 275-276).

Scale notes: dt/lgb/chi aggregate ``groupBy(x)`` first — the driver only
ever sees distinct values. ``MAX_DISTINCT`` caps that (always on,
default 100k): collects go through ``limit(cap+1)`` so the driver never
materializes more, and beyond the cap the fit quantizes x to
``PRE_BINS`` percentile micro-bins (documented approximation; exact
below the cap, so all small-scale parity goldens are unaffected).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..functions.binexpr import bin_expr
from ..functions.driver_fit import cart_thresholds, chimerge_edges, lgb_thresholds

DEFAULT_BINS = 10

# Driver-collect cap: a fit never materializes more than MAX_DISTINCT
# grouped rows on the driver. Above it, continuous fits pre-quantize to
# PRE_BINS percentile micro-bins (the documented approximation for
# continuous doubles at cluster scale — distinct ~= rows there).
MAX_DISTINCT = 100_000
PRE_BINS = 10_000


def _clean(df: DataFrame, col: str) -> Column:
    """Treat float NaN as NULL so aggregations skip it like pandas does."""
    c = F.col(col).cast("double")
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def collect_capped(agg_df: DataFrame, max_distinct: int | None) -> list | None:
    """collect() through ``limit(cap + 1)`` so the driver never
    materializes more than the cap; returns None when the cap is
    exceeded (the caller falls back to a quantized/top-k plan). The
    limit also lets Spark stop the final stage early — the common
    small-vocabulary case costs exactly the one aggregation it always
    did. Only ``None`` means uncapped; a zero/negative cap is a caller
    bug, not an implicit "collect everything"."""
    if max_distinct is None:
        return agg_df.collect()
    if max_distinct <= 0:
        raise ValueError(f"max_distinct must be positive or None, got {max_distinct}")
    rows = agg_df.limit(max_distinct + 1).collect()
    return None if len(rows) > max_distinct else rows


def micro_bin_expr(df: DataFrame, xc: Column, pre_bins: int = PRE_BINS) -> Column:
    """Exact-percentile micro-bin id for ``xc`` — the pre-quantization
    pass used when distinct(x) exceeds the driver cap. One
    percentile_approx aggregation (accuracy scaled to the bin count so
    adjacent micro-bins are actually distinguishable), then the shared
    right-closed bin expression."""
    qs = [i / pre_bins for i in range(1, pre_bins)]
    ps = df.select(
        F.percentile_approx(xc, qs, max(10_000, pre_bins * 10)).alias("p")
    ).first()["p"]
    edges: list[float] = []
    for p in ps or []:
        if p is not None and (not edges or float(p) > edges[-1]):
            edges.append(float(p))
    return bin_expr(xc, [-math.inf, *edges, math.inf])


def _value_class_counts(
    df: DataFrame,
    col: str,
    target: str,
    max_distinct: int | None = MAX_DISTINCT,
    pre_bins: int = PRE_BINS,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """groupBy(x) -> (distinct values, count(y=0), count(y=1)); the one
    distributed pass behind every supervised fit. Above ``max_distinct``
    distinct values the fit re-aggregates over ``pre_bins`` percentile
    micro-bins (representative = max x in the bin, so thresholds fitted
    between representatives separate exactly the same rows as
    thresholds between micro-bins)."""
    base = (
        df.select(_clean(df, col).alias("__x"), F.col(target).cast("double").alias("__y"))
        .where(F.col("__x").isNotNull())
    )
    agg = base.groupBy("__x").agg(
        F.sum(F.lit(1.0) - F.col("__y")).alias("c0"),
        F.sum("__y").alias("c1"),
    )
    rows = collect_capped(agg, max_distinct)
    if rows is None:
        rows = (
            base.select(micro_bin_expr(base, F.col("__x"), pre_bins).alias("__b"), "__x", "__y")
            .groupBy("__b")
            .agg(
                F.max("__x").alias("__x"),
                F.sum(F.lit(1.0) - F.col("__y")).alias("c0"),
                F.sum("__y").alias("c1"),
            )
            .collect()
        )
    rows.sort(key=lambda r: r["__x"])
    v = np.array([r["__x"] for r in rows], dtype=float)
    c0 = np.array([r["c0"] for r in rows], dtype=float)
    c1 = np.array([r["c1"] for r in rows], dtype=float)
    return v, c0, c1


def step_edges(
    df: DataFrame, col: str, n_bins: int = DEFAULT_BINS, remove_empty_bins: bool = True
) -> list[float]:
    """Equal-width edges, pd.cut-compatible (linspace over [min, max]),
    with the reference's empty-bin merge (cut.py:45-54): interior edge i
    is kept iff bin i is non-empty. Outer edges are ±inf."""
    mn, mx = df.select(
        F.min(_clean(df, col)), F.max(_clean(df, col))
    ).first()
    if mn is None:
        return [-math.inf, math.inf]
    edges = np.linspace(float(mn), float(mx), n_bins + 1)
    interior = [float(e) for e in edges[1:-1]]
    full = [-math.inf, *interior, math.inf]
    if not remove_empty_bins:
        return full
    counts = (
        df.select(bin_expr(_clean(df, col), full).alias("__b"))
        .where(F.col("__b") >= 0)
        .groupBy("__b")
        .count()
        .collect()
    )
    present = {r["__b"] for r in counts}
    kept = [interior[i - 1] for i in range(1, n_bins) if i in present]
    return [-math.inf, *kept, math.inf]


def quantile_edges(
    df: DataFrame, col: str, n_bins: int = DEFAULT_BINS, exact: bool = True,
    approx_accuracy: int = 10000, max_distinct: int | None = MAX_DISTINCT,
    pre_bins: int = PRE_BINS,
) -> list[float]:
    """Equal-frequency edges, pd.qcut-compatible (linear interpolation,
    duplicate edges dropped, cut.py:94-95), outer edges ±inf.

    exact=True aggregates ``groupBy(value).count()`` and interpolates on
    the driver with the SAME float arithmetic as numpy percentile —
    Spark's exact `percentile` differs from numpy by sub-ulp rounding at
    run boundaries, which flips pd.qcut's duplicate-drop. exact=False
    uses percentile_approx for columns whose distinct count is too large
    to collect (documented tolerance at cluster scale)."""
    if not exact:
        qs = [i / n_bins for i in range(n_bins + 1)]
        arr = ", ".join(str(q) for q in qs)
        row = (
            df.select(_clean(df, col).alias("__xq"))
            .select(
                F.expr(
                    f"percentile_approx(__xq, array({arr}), {approx_accuracy})"
                ).alias("p")
            )
            .first()
        )
        ps = row["p"]
        if ps is None or ps[0] is None:
            return [-math.inf, math.inf]
        uniq: list[float] = []
        for p in ps:
            if not uniq or float(p) > uniq[-1]:
                uniq.append(float(p))
        return [-math.inf, *uniq[1:-1], math.inf]

    base = (
        df.select(_clean(df, col).alias("__xq"))
        .where(F.col("__xq").isNotNull())
    )
    rows = collect_capped(base.groupBy("__xq").count(), max_distinct)
    if rows is None:
        # above the driver cap: weighted interpolation over percentile
        # micro-bins (representative = bin max) — the documented
        # approximation for continuous doubles at cluster scale
        rows = (
            base.select(micro_bin_expr(base, F.col("__xq"), pre_bins).alias("__b"), "__xq")
            .groupBy("__b")
            .agg(F.max("__xq").alias("__xq"), F.count(F.lit(1)).alias("count"))
            .collect()
        )
    if not rows:
        return [-math.inf, math.inf]
    rows.sort(key=lambda r: r["__xq"])
    values = np.array([r["__xq"] for r in rows], dtype=float)
    counts = np.array([r["count"] for r in rows], dtype=float)
    from ..functions.driver_fit import quantile_edges_weighted

    interior = quantile_edges_weighted(values, counts, n_bins)
    return [-math.inf, *interior, math.inf]


def dt_edges(
    df: DataFrame, col: str, target: str, n_bins: int = DEFAULT_BINS,
    min_bin: float = 0.01, max_distinct: int | None = MAX_DISTINCT,
    pre_bins: int = PRE_BINS,
) -> list[float]:
    v, c0, c1 = _value_class_counts(df, col, target, max_distinct, pre_bins)
    if len(v) == 0:
        return [-math.inf, math.inf]
    n = int((c0 + c1).sum())
    msl = max(1, math.ceil(min_bin * n))
    thr = cart_thresholds(v, c0, c1, max_leaf_nodes=n_bins, min_samples_leaf=msl)
    return [-math.inf, *thr, math.inf]


def lgb_edges(
    df: DataFrame, col: str, target: str, n_bins: int = DEFAULT_BINS,
    min_bin: float = 0.01, max_distinct: int | None = MAX_DISTINCT,
    pre_bins: int = PRE_BINS,
) -> list[float]:
    # reference computes min_child_samples from len(x) INCLUDING NaN
    # (cut.py:198), then fits on non-null values (cut.py:206)
    n_total = df.count()
    v, c0, c1 = _value_class_counts(df, col, target, max_distinct, pre_bins)
    if len(v) == 0:
        return [-math.inf, math.inf]
    mcs = max(1, math.ceil(min_bin * n_total))
    thr = lgb_thresholds(v, c0, c1, num_leaves=n_bins, min_child_samples=mcs)
    return [-math.inf, *thr, math.inf]


def chi_edges(
    df: DataFrame, col: str, target: str, n_bins: int = DEFAULT_BINS, cf: float = 0.1,
    max_distinct: int | None = MAX_DISTINCT, pre_bins: int = PRE_BINS,
) -> list[float]:
    v, c0, c1 = _value_class_counts(df, col, target, max_distinct, pre_bins)
    if len(v) == 0:
        return [-math.inf, math.inf]
    edges = chimerge_edges(v, c0, c1, n_bins=n_bins, cf=cf)
    return [-math.inf, *edges[1:-1], math.inf]


class Binner:
    """fit/transform discretizer (reference cut.py:357-407 dispatcher).

    >>> b = Binner(method="quantile", n_bins=10).fit(df, "x")
    >>> df2 = b.transform(df, "x", "x_bin")
    """

    def __init__(
        self,
        method: str = "dt",
        n_bins: int = DEFAULT_BINS,
        nan_value: int = -1,
        **kwargs,
    ):
        self.method = method
        self.n_bins = n_bins
        self.nan_value = nan_value
        self.kwargs = kwargs
        self.edges: list[float] | None = None

    def fit(self, df: DataFrame, col: str, target: str | None = None) -> "Binner":
        if self.method == "step":
            self.edges = step_edges(df, col, self.n_bins, **self.kwargs)
        elif self.method == "quantile":
            self.edges = quantile_edges(df, col, self.n_bins, **self.kwargs)
        elif self.method == "dt":
            self.edges = dt_edges(df, col, target, self.n_bins, **self.kwargs)
        elif self.method == "lgb":
            self.edges = lgb_edges(df, col, target, self.n_bins, **self.kwargs)
        elif self.method == "chi":
            self.edges = chi_edges(df, col, target, self.n_bins, **self.kwargs)
        else:
            raise ValueError(f"unsupported method `{self.method}`")
        return self

    def expr(self, col: str | Column) -> Column:
        assert self.edges is not None, "fit first"
        return bin_expr(
            _clean_col(col), self.edges, nan_value=self.nan_value, right=True
        )

    def transform(self, df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
        return df.withColumn(out_col or f"{col}_bin", self.expr(col))


def _clean_col(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def cut_with_edges(
    df: DataFrame, col: str, edges: Sequence[float], out_col: str | None = None,
    nan_value: int = -1, right: bool = True,
) -> DataFrame:
    """Transform-only fixed-edge cut (reference cut.py:410-433)."""
    return df.withColumn(
        out_col or f"{col}_bin",
        bin_expr(_clean_col(col), list(edges), nan_value=nan_value, right=right),
    )


# ------------------------------------------------------------------
# reference-named convenience wrappers (didtool/cut.py:15-433): the
# pandas-series API becomes (df, col) -> DataFrame with `<col>_bin`;
# return_bins keeps the reference's (codes, bins) contract as
# (DataFrame, edges). All fitting/binning is the distributed machinery
# above — these exist so reference call sites port one-to-one.
def step_cut(df: DataFrame, col: str, n_bins: int = DEFAULT_BINS,
             nan: int = -1, return_bins: bool = False,
             out_col: str | None = None, **kwargs):
    """cut.py:15-66 equal-width cut."""
    edges = step_edges(df, col, n_bins, **kwargs)
    out = cut_with_edges(df, col, edges, out_col=out_col, nan_value=nan)
    return (out, edges) if return_bins else out


def quantile_cut(df: DataFrame, col: str, n_bins: int = DEFAULT_BINS,
                 nan: int = -1, return_bins: bool = False,
                 out_col: str | None = None, **kwargs):
    """cut.py:69-104 equal-frequency cut."""
    edges = quantile_edges(df, col, n_bins, **kwargs)
    out = cut_with_edges(df, col, edges, out_col=out_col, nan_value=nan)
    return (out, edges) if return_bins else out


def dt_cut(df: DataFrame, col: str, target: str,
           n_bins: int = DEFAULT_BINS, nan: int = -1,
           return_bins: bool = False, out_col: str | None = None, **kwargs):
    """cut.py:107-161 CART-boundary cut."""
    edges = dt_edges(df, col, target, n_bins, **kwargs)
    out = cut_with_edges(df, col, edges, out_col=out_col, nan_value=nan)
    return (out, edges) if return_bins else out


def lgb_cut(df: DataFrame, col: str, target: str,
            n_bins: int = DEFAULT_BINS, nan: int = -1,
            return_bins: bool = False, out_col: str | None = None, **kwargs):
    """cut.py:164-231 LightGBM-histogram cut."""
    edges = lgb_edges(df, col, target, n_bins, **kwargs)
    out = cut_with_edges(df, col, edges, out_col=out_col, nan_value=nan)
    return (out, edges) if return_bins else out


def chi_square_cut(df: DataFrame, col: str, target: str,
                   n_bins: int = DEFAULT_BINS, cf: float = 0.1,
                   nan: int = -1, return_bins: bool = False,
                   out_col: str | None = None, **kwargs):
    """cut.py:253-354 ChiMerge cut."""
    edges = chi_edges(df, col, target, n_bins, cf=cf, **kwargs)
    out = cut_with_edges(df, col, edges, out_col=out_col, nan_value=nan)
    return (out, edges) if return_bins else out


def cut(df: DataFrame, col: str, target: str | None = None,
        method: str = "dt", n_bins: int = DEFAULT_BINS, nan: int = -1,
        return_bins: bool = False, out_col: str | None = None, **kwargs):
    """cut.py:357-407 dispatcher (step/quantile need no target)."""
    b = Binner(method=method, n_bins=n_bins, nan_value=nan, **kwargs)
    b.fit(df, col, target)
    out = b.transform(df, col, out_col)
    return (out, b.edges) if return_bins else out


def cut_with_bins(df: DataFrame, col: str, bins: Sequence[float],
                  nan: int = -1, right: bool = True,
                  out_col: str | None = None) -> DataFrame:
    """cut.py:410-433: transform with precomputed bins."""
    return cut_with_edges(
        df, col, bins, out_col=out_col, nan_value=nan, right=right
    )
