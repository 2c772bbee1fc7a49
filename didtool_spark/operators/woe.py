"""WOE transformers and encoders (reference didtool/transformer.py:15-313,
didtool/encoder.py:11-96, woe math from didtool/metric.py:17-63).

Design: fit is ONE distributed aggregation per feature —
``groupBy(value).agg(count0, count1)`` — followed by driver math over
distinct values (ordering, code assignment, supervised binning via
functions.driver_fit, 0.5-floor WOE). transform is a generated literal
map/CASE expression (JVM-side, broadcastable). The reference's
multiprocessing.Pool-per-feature (transformer.py:268) becomes cluster
parallelism: each feature's agg is its own Spark job.

Exact semantics preserved:
- probability 0.5 floors (metric.py:39-44) in every woe/iv;
- categorical path: values stringified, '' and 'nan' -> missing
  (transformer.py:80), category order by mean(label) asc then value asc
  (transformer.py:82-83), codes binned with cut(method) and bins
  clamped to [-99, max_code] (transformer.py:101-102);
- unknown value -> null code -> bin -1 -> NA woe if NaN was seen at fit
  else ``default`` (transformer.py:167-173);
- WOETransformer fits every feature with is_continuous=False
  (transformer.py:273).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..functions.binexpr import bin_expr
from ..functions.driver_fit import (
    cart_thresholds,
    chimerge_edges,
    lgb_thresholds,
    step_edges_weighted,
    quantile_edges_weighted,
)
from ..functions.exprs import map_expr

DEFAULT_BINS = 10


def woe_value(prob1: float, prob0: float) -> float:
    """metric.py:52-63."""
    return math.log(prob1 / prob0)


def _floors(g1: float, g0: float, total1: float, total0: float) -> tuple[float, float]:
    """probability() 0.5 floors (metric.py:39-48)."""
    prob1 = max(g1, 0.5) / max(total1, 0.5)
    prob0 = max(g0, 0.5) / max(total0, 0.5)
    return prob1, prob0


def _normalize_str(c: Column) -> Column:
    """pandas astype(str).replace(['nan',''], nan) equivalent."""
    s = c.cast("string")
    return F.when(s.isin("nan", "NaN", "") | s.isNull(), F.lit(None)).otherwise(s)


def _fit_thresholds(
    codes: np.ndarray, c0: np.ndarray, c1: np.ndarray, method: str, n_bins: int
) -> list[float]:
    """Supervised/unsupervised cut over aggregated (value, class-count)
    rows — mirrors cut.py:357-407 dispatch on driver-side data."""
    n = int((c0 + c1).sum())
    if method == "dt":
        msl = max(1, math.ceil(0.01 * n))
        return cart_thresholds(codes, c0, c1, max_leaf_nodes=n_bins, min_samples_leaf=msl)
    if method == "lgb":
        mcs = max(1, math.ceil(0.01 * n))
        return lgb_thresholds(codes, c0, c1, num_leaves=n_bins, min_child_samples=mcs)
    if method == "chi":
        edges = chimerge_edges(codes, c0, c1, n_bins=n_bins)
        return edges[1:-1]
    if method == "step":
        return step_edges_weighted(codes, c0 + c1, n_bins)
    if method == "quantile":
        return quantile_edges_weighted(codes, c0 + c1, n_bins)
    raise ValueError(f"unsupported method `{method}`")


@dataclass
class SingleWOETransformer:
    """transformer.py:15-208. fit state: bins, woe_map, value2code."""

    cut_method: str = "dt"
    n_bins: int = DEFAULT_BINS
    is_continuous: bool = True

    bins: list[float] = field(default_factory=list)
    woe_map: dict = field(default_factory=dict)
    value2code: dict = field(default_factory=dict)
    code2value: dict = field(default_factory=dict)
    var_name: str = "x"
    woe_df: pd.DataFrame | None = None

    def fit(self, df: DataFrame, col: str, target: str, var_name: str | None = None):
        self.var_name = var_name or col
        y = F.col(target).cast("double")
        if self.is_continuous:
            xc = F.col(col).cast("double")
            xc = F.when(F.isnan(xc), F.lit(None)).otherwise(xc)
        else:
            xc = _normalize_str(F.col(col))
        rows = (
            df.select(xc.alias("__x"), y.alias("__y"))
            .groupBy("__x")
            .agg(F.sum(F.lit(1.0) - F.col("__y")).alias("c0"), F.sum("__y").alias("c1"))
            .collect()
        )
        null_c0 = sum(r["c0"] for r in rows if r["__x"] is None)
        null_c1 = sum(r["c1"] for r in rows if r["__x"] is None)
        vals = sorted([r for r in rows if r["__x"] is not None], key=lambda r: r["__x"])
        total0 = sum(r["c0"] for r in rows)
        total1 = sum(r["c1"] for r in rows)
        total = total0 + total1

        if not vals:
            self.bins, self.woe_map = [], {}
            self.woe_df = pd.DataFrame()
            return self

        if self.is_continuous:
            codes = np.array([float(r["__x"]) for r in vals])
            self.value2code, self.code2value = {}, {}
        else:
            # order by mean(label) asc, value asc (stable like pandas)
            means = [
                (r["c1"] / (r["c0"] + r["c1"]), r["__x"], r) for r in vals
            ]
            means.sort(key=lambda t: (t[0], t[1]))
            self.value2code = {t[1]: i for i, t in enumerate(means)}
            self.code2value = {i: t[1] for i, t in enumerate(means)}
            vals = [t[2] for t in means]
            codes = np.arange(len(vals), dtype=float)

        c0 = np.array([float(r["c0"]) for r in vals])
        c1 = np.array([float(r["c1"]) for r in vals])

        thr = _fit_thresholds(codes, c0, c1, self.cut_method, self.n_bins)
        if self.is_continuous:
            bins = [-math.inf, *thr, math.inf]
        else:
            bins = [-99.0, *thr, float(max(self.code2value.keys()))]
        self.bins = [float(b) for b in bins]

        # bin id per distinct code: right-closed (bins[i], bins[i+1]] ->
        # bin = count of interior edges strictly below the code
        interior = np.array(self.bins[1:-1], dtype=float)
        if len(interior):
            bin_ids = np.searchsorted(interior, codes, side="left").astype(int)
        else:
            bin_ids = np.zeros(len(codes), dtype=int)

        has_na = (null_c0 + null_c1) > 0
        agg: dict[int, list[float]] = {}
        if has_na:
            agg[-1] = [null_c0, null_c1]
        for b, a0, a1 in zip(bin_ids, c0, c1):
            agg.setdefault(int(b), [0.0, 0.0])
            agg[int(b)][0] += a0
            agg[int(b)][1] += a1

        woe_rows = []
        self.woe_map = {}
        for b in sorted(agg):
            g0, g1 = agg[b]
            prob1, prob0 = _floors(g1, g0, total1, total0)
            w = woe_value(prob1, prob0)
            self.woe_map[b] = w
            n_grp = g0 + g1
            woe_rows.append(
                {
                    "var_name": self.var_name,
                    "bin_value": b,
                    "group_count": int(n_grp),
                    "group_rate": n_grp / total,
                    "positive_count": int(g1),
                    "positive_rate": g1 / n_grp if n_grp else float("nan"),
                    "woe": w,
                    "iv_list": (prob1 - prob0) * w,
                }
            )
        self.woe_df = pd.DataFrame(woe_rows)
        if len(self.woe_df):
            self.woe_df["var_iv"] = self.woe_df["iv_list"].sum()
        return self

    @property
    def var_iv(self) -> float:
        return float(self.woe_df["var_iv"].iloc[0]) if len(self.woe_df) else 0.0

    def expr(self, col: str, default: float = 0.0) -> Column:
        """woe transform as a single column expression
        (transformer.py:151-178)."""
        if self.is_continuous:
            c = F.col(col).cast("double")
            c = F.when(F.isnan(c), F.lit(None)).otherwise(c)
        else:
            c = map_expr(_normalize_str(F.col(col)), self.value2code).cast("double")
        b = bin_expr(c, self.bins, nan_value=-1, right=True)
        return map_expr(b, self.woe_map, default=float(default)).cast("double")

    def transform(
        self, df: DataFrame, col: str, out_col: str | None = None, default: float = 0.0
    ) -> DataFrame:
        return df.withColumn(out_col or f"{col}_woe", self.expr(col, default))


class WOETransformer:
    """Multi-feature WOE (transformer.py:217-313): every feature fitted
    with is_continuous=False; transform keeps non-listed columns."""

    def __init__(self, cut_method: str = "dt", n_bins: int = DEFAULT_BINS,
                 features: list[str] | None = None):
        self.cut_method = cut_method
        self.n_bins = n_bins
        self.features = features
        self.transformers: dict[str, SingleWOETransformer] = {}
        self.woe_df: pd.DataFrame | None = None

    def fit(self, df: DataFrame, target: str):
        feats = self.features or [c for c in df.columns if c != target]
        for f_ in feats:
            if f_ not in df.columns:
                raise ValueError(f"{f_} not in df")
        self.features = feats

        # concurrent per-feature fits: the reference's
        # multiprocessing.Pool (transformer.py:268) becomes concurrent
        # Spark jobs from driver threads — the cluster is the pool
        from concurrent.futures import ThreadPoolExecutor

        def fit_one(f_):
            t = SingleWOETransformer(self.cut_method, self.n_bins, is_continuous=False)
            t.fit(df, f_, target, var_name=f_)
            return f_, t

        with ThreadPoolExecutor(max_workers=min(8, len(feats))) as pool:
            for f_, t in pool.map(fit_one, feats):
                self.transformers[f_] = t
        self.woe_df = pd.concat(
            [self.transformers[f_].woe_df for f_ in feats]
        )
        return self

    def transform(self, df: DataFrame, default: float = 0.0) -> DataFrame:
        cols = []
        for c in df.columns:
            if c in self.transformers:
                cols.append(self.transformers[c].expr(c, default).alias(c))
            else:
                cols.append(F.col(c))
        return df.select(*cols)


class WOEEncoder:
    """Per-distinct-value WOE (encoder.py:11-81): raw values (no binning),
    NaN keyed as 'NA', unknown -> default."""

    NA = "NA"

    def __init__(self):
        self.woe_map: dict = {}

    def fit(self, df: DataFrame, col: str, target: str):
        y = F.col(target).cast("double")
        xc = F.col(col)
        xc = F.when(F.coalesce(F.isnan(xc.try_cast("double")), F.lit(False)), F.lit(None)).otherwise(xc)
        rows = (
            df.select(xc.alias("__x"), y.alias("__y"))
            .groupBy("__x")
            .agg(F.sum(F.lit(1.0) - F.col("__y")).alias("c0"), F.sum("__y").alias("c1"))
            .collect()
        )
        total0 = sum(r["c0"] for r in rows)
        total1 = sum(r["c1"] for r in rows)
        self.woe_map = {}
        for r in rows:
            prob1, prob0 = _floors(r["c1"], r["c0"], total1, total0)
            key = self.NA if r["__x"] is None else r["__x"]
            self.woe_map[key] = woe_value(prob1, prob0)
        return self

    def expr(self, col: str, default: float = 0.0) -> Column:
        m = {k: v for k, v in self.woe_map.items() if k != self.NA}
        out = map_expr(F.col(col), m, default=float(default))
        if self.NA in self.woe_map:
            na = F.lit(self.woe_map[self.NA])
            c = F.col(col)
            out = F.when(
                c.isNull() | F.coalesce(F.isnan(c.try_cast("double")), F.lit(False)), na
            ).otherwise(out)
        return out.cast("double")

    def transform(self, df: DataFrame, col: str, out_col: str | None = None,
                  default: float = 0.0) -> DataFrame:
        return df.withColumn(out_col or f"{col}_woe", self.expr(col, default))


class LabelEncoder:
    """WrappedLabelEncoder (encoder.py:84-96): sorted distinct non-null
    values -> 0..n-1; unknown/null -> missing_value."""

    def __init__(self, missing_value: int = -1):
        self.missing_value = missing_value
        self.classes_: list = []

    def fit(self, df: DataFrame, col: str):
        vals = [
            r[0]
            for r in df.select(col).where(F.col(col).isNotNull()).distinct().collect()
        ]
        self.classes_ = sorted(vals)
        return self

    def expr(self, col: str) -> Column:
        m = {v: i for i, v in enumerate(self.classes_)}
        return map_expr(F.col(col), m, default=self.missing_value).cast("int")

    def transform(self, df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
        return df.withColumn(out_col or f"{col}_code", self.expr(col))
