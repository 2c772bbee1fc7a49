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
from ..functions.exprs import MAP_EXPR_MAX, map_expr, with_lookup
from .binning import MAX_DISTINCT, PRE_BINS, collect_capped, micro_bin_expr

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
    codes: np.ndarray, c0: np.ndarray, c1: np.ndarray, method: str, n_bins: int,
    n_total: int | None = None,
) -> list[float]:
    """Supervised/unsupervised cut over aggregated (value, class-count)
    rows — mirrors cut.py:357-407 dispatch on driver-side data.
    ``n_total`` is the null-INCLUSIVE row count: the reference's lgb_cut
    derives min_child_samples from len(x) including NaN (cut.py:198)
    while dt_cut uses the non-null count (cut.py:146-147)."""
    n = int((c0 + c1).sum())
    if method == "dt":
        msl = max(1, math.ceil(0.01 * n))
        return cart_thresholds(codes, c0, c1, max_leaf_nodes=n_bins, min_samples_leaf=msl)
    if method == "lgb":
        mcs = max(1, math.ceil(0.01 * (n_total if n_total is not None else n)))
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
    # driver-collect cap (binning.MAX_DISTINCT); above it continuous
    # fits pre-quantize to percentile micro-bins and categorical fits
    # keep the top-max_distinct categories by frequency (dropped tail
    # values hit the unknown path at transform — documented divergence)
    max_distinct: int = MAX_DISTINCT
    pre_bins: int = PRE_BINS

    bins: list[float] = field(default_factory=list)
    woe_map: dict = field(default_factory=dict)
    value2code: dict = field(default_factory=dict)
    code2value: dict = field(default_factory=dict)
    value2woe: dict = field(default_factory=dict)
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
        base = df.select(xc.alias("__x"), y.alias("__y"))
        c_aggs = [
            F.sum(F.lit(1.0) - F.col("__y")).alias("c0"),
            F.sum("__y").alias("c1"),
        ]
        rows = collect_capped(base.groupBy("__x").agg(*c_aggs), self.max_distinct)
        if rows is None:
            # over the driver cap: exact totals + null counts in one tiny
            # aggregation, then the bounded per-value pass
            tot = base.agg(
                F.sum(F.lit(1.0) - F.col("__y")).alias("t0"),
                F.sum("__y").alias("t1"),
                F.sum(
                    F.when(F.col("__x").isNull(), F.lit(1.0) - F.col("__y")).otherwise(F.lit(0.0))
                ).alias("n0"),
                F.sum(
                    F.when(F.col("__x").isNull(), F.col("__y")).otherwise(F.lit(0.0))
                ).alias("n1"),
            ).first()
            nn = base.where(F.col("__x").isNotNull())
            if self.is_continuous:
                rows = (
                    nn.select(
                        micro_bin_expr(nn, F.col("__x"), self.pre_bins).alias("__b"),
                        "__x", "__y",
                    )
                    .groupBy("__b")
                    .agg(F.max("__x").alias("__x"), *c_aggs)
                    .collect()
                )
            else:
                # top-k categories by frequency (TakeOrdered — scale-safe)
                rows = (
                    nn.groupBy("__x").agg(*c_aggs)
                    .orderBy(F.desc(F.col("c0") + F.col("c1")), F.asc("__x"))
                    .limit(self.max_distinct)
                    .collect()
                )
            null_c0, null_c1 = float(tot["n0"] or 0), float(tot["n1"] or 0)
            total0, total1 = float(tot["t0"] or 0), float(tot["t1"] or 0)
            vals = sorted(rows, key=lambda r: r["__x"])
        else:
            null_c0 = sum(r["c0"] for r in rows if r["__x"] is None)
            null_c1 = sum(r["c1"] for r in rows if r["__x"] is None)
            vals = sorted(
                [r for r in rows if r["__x"] is not None], key=lambda r: r["__x"]
            )
            total0 = sum(r["c0"] for r in rows)
            total1 = sum(r["c1"] for r in rows)
        return self._fit_from_stats(vals, null_c0, null_c1, total0, total1)

    def _fit_from_stats(
        self, vals: list, null_c0: float, null_c1: float,
        total0: float, total1: float,
    ) -> "SingleWOETransformer":
        """Driver math over aggregated (__x, c0, c1) rows (sorted by
        __x, nulls removed) — shared by the per-feature fit and
        WOETransformer's single-pass melted fit."""
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

        thr = _fit_thresholds(
            codes, c0, c1, self.cut_method, self.n_bins,
            n_total=int(round(total)),
        )
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
        if not self.is_continuous:
            # direct value -> woe table for the broadcast-join transform
            # path (large vocabularies must not inline into codegen)
            self.value2woe = {
                self.code2value[int(c)]: self.woe_map[int(b)]
                for c, b in zip(codes, bin_ids)
            }
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
        out_col = out_col or f"{col}_woe"
        if not self.is_continuous and len(self.value2code) > MAP_EXPR_MAX:
            # large vocabulary: one broadcast-join on the precomputed
            # value -> woe table instead of a megabyte literal map.
            # Unknown value or NULL -> code NULL -> bin -1 semantics.
            unknown = float(self.woe_map.get(-1, default))
            out = with_lookup(
                df, _normalize_str(F.col(col)), self.value2woe, out_col,
                default=unknown,
            )
            return out.withColumn(out_col, F.col(out_col).cast("double"))
        return df.withColumn(out_col, self.expr(col, default))


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

    def fit(self, df: DataFrame, target: str, max_distinct: int = MAX_DISTINCT):
        """Single-pass melted fit: explode every feature into
        (feature, value) structs and aggregate class counts with ONE
        groupBy(feature, value) over ONE source scan — at F features on
        100 TB this replaces F full scans (the reference's Pool per
        feature, transformer.py:268; SURVEY §3.1 names this plan). The
        map-side combine bounds the shuffle at partitions x Σ distinct.
        Falls back to per-feature fits (concurrent Spark jobs, each
        with its own driver cap) if the combined distinct count exceeds
        ``max_distinct``."""
        feats = self.features or [c for c in df.columns if c != target]
        for f_ in feats:
            if f_ not in df.columns:
                raise ValueError(f"{f_} not in df")
        self.features = feats

        y = F.col(target).cast("double")
        pairs = F.array(
            *[
                F.struct(
                    F.lit(f_).alias("f"), _normalize_str(F.col(f_)).alias("x")
                )
                for f_ in feats
            ]
        )
        agg = (
            df.select(F.explode(pairs).alias("p"), y.alias("__y"))
            .groupBy(F.col("p.f").alias("__f"), F.col("p.x").alias("__x"))
            .agg(
                F.sum(F.lit(1.0) - F.col("__y")).alias("c0"),
                F.sum("__y").alias("c1"),
            )
        )
        rows = collect_capped(agg, max_distinct)
        if rows is None:
            return self._fit_per_feature(df, target, feats)

        by_feat: dict[str, list] = {f_: [] for f_ in feats}
        for r in rows:
            by_feat[r["__f"]].append(r)
        for f_ in feats:
            fr = by_feat[f_]
            null_c0 = sum(r["c0"] for r in fr if r["__x"] is None)
            null_c1 = sum(r["c1"] for r in fr if r["__x"] is None)
            vals = sorted(
                [r for r in fr if r["__x"] is not None], key=lambda r: r["__x"]
            )
            t = SingleWOETransformer(self.cut_method, self.n_bins, is_continuous=False)
            t.var_name = f_
            t._fit_from_stats(
                vals, null_c0, null_c1,
                sum(r["c0"] for r in fr), sum(r["c1"] for r in fr),
            )
            self.transformers[f_] = t
        self.woe_df = pd.concat([self.transformers[f_].woe_df for f_ in feats])
        return self

    def _fit_per_feature(self, df: DataFrame, target: str, feats: list[str]):
        """Fallback above the melt cap: the reference's
        multiprocessing.Pool (transformer.py:268) becomes concurrent
        Spark jobs from driver threads — the cluster is the pool."""
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
        big = {
            c for c, t in self.transformers.items()
            if not t.is_continuous and len(t.value2code) > MAP_EXPR_MAX
        }
        cols = []
        for c in df.columns:
            if c in self.transformers and c not in big:
                cols.append(self.transformers[c].expr(c, default).alias(c))
            else:
                cols.append(F.col(c))
        out = df.select(*cols)
        # large-vocabulary features go through the broadcast-join path
        # (withColumn replaces in place, preserving column order)
        for c in big:
            out = (
                self.transformers[c]
                .transform(out, c, out_col="__woe_big", default=default)
                .withColumn(c, F.col("__woe_big"))
                .drop("__woe_big")
            )
        return out


class WOEEncoder:
    """Per-distinct-value WOE (encoder.py:11-81): raw values (no binning),
    NaN keyed as 'NA', unknown -> default."""

    NA = "NA"

    def __init__(self):
        self.woe_map: dict = {}

    def fit(self, df: DataFrame, col: str, target: str,
            max_distinct: int = MAX_DISTINCT):
        y = F.col(target).cast("double")
        xc = F.col(col)
        xc = F.when(F.coalesce(F.isnan(xc.try_cast("double")), F.lit(False)), F.lit(None)).otherwise(xc)
        base = df.select(xc.alias("__x"), y.alias("__y"))
        c_aggs = [
            F.sum(F.lit(1.0) - F.col("__y")).alias("c0"),
            F.sum("__y").alias("c1"),
        ]
        rows = collect_capped(base.groupBy("__x").agg(*c_aggs), max_distinct)
        if rows is None:
            # over the driver cap: exact totals + NA counts in one tiny
            # aggregation; keep the top-max_distinct values by frequency
            # (dropped tail -> `default` at transform, like any unknown)
            tot = base.agg(
                F.sum(F.lit(1.0) - F.col("__y")).alias("t0"),
                F.sum("__y").alias("t1"),
                F.sum(
                    F.when(F.col("__x").isNull(), F.lit(1.0) - F.col("__y")).otherwise(F.lit(0.0))
                ).alias("n0"),
                F.sum(
                    F.when(F.col("__x").isNull(), F.col("__y")).otherwise(F.lit(0.0))
                ).alias("n1"),
            ).first()
            rows = (
                base.where(F.col("__x").isNotNull())
                .groupBy("__x").agg(*c_aggs)
                .orderBy(F.desc(F.col("c0") + F.col("c1")), F.asc("__x"))
                .limit(max_distinct)
                .collect()
            )
            total0, total1 = float(tot["t0"] or 0), float(tot["t1"] or 0)
            pairs = [(r["__x"], r["c0"], r["c1"]) for r in rows]
            if (tot["n0"] or 0) + (tot["n1"] or 0) > 0:
                pairs.append((None, float(tot["n0"]), float(tot["n1"])))
        else:
            total0 = sum(r["c0"] for r in rows)
            total1 = sum(r["c1"] for r in rows)
            pairs = [(r["__x"], r["c0"], r["c1"]) for r in rows]
        self.woe_map = {}
        for x, g0, g1 in pairs:
            prob1, prob0 = _floors(g1, g0, total1, total0)
            key = self.NA if x is None else x
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
        out_col = out_col or f"{col}_woe"
        m = {k: v for k, v in self.woe_map.items() if k != self.NA}
        if len(m) > MAP_EXPR_MAX:
            out = with_lookup(df, F.col(col), m, out_col, default=float(default))
            if self.NA in self.woe_map:
                c = F.col(col)
                out = out.withColumn(
                    out_col,
                    F.when(
                        c.isNull()
                        | F.coalesce(F.isnan(c.try_cast("double")), F.lit(False)),
                        F.lit(self.woe_map[self.NA]),
                    ).otherwise(F.col(out_col)),
                )
            return out.withColumn(out_col, F.col(out_col).cast("double"))
        return df.withColumn(out_col, self.expr(col, default))


class LabelEncoder:
    """WrappedLabelEncoder (encoder.py:84-96): sorted distinct non-null
    values -> 0..n-1; unknown/null -> missing_value."""

    def __init__(self, missing_value: int = -1):
        self.missing_value = missing_value
        self.classes_: list = []

    def fit(self, df: DataFrame, col: str, max_distinct: int = MAX_DISTINCT):
        rows = collect_capped(
            df.select(col).where(F.col(col).isNotNull()).distinct(), max_distinct
        )
        if rows is None:
            raise ValueError(
                f"LabelEncoder.fit: `{col}` exceeds {max_distinct} distinct values; "
                "label codes are driver-side fit state — raise max_distinct "
                "explicitly, or hash/bucket the column instead of label-encoding it"
            )
        self.classes_ = sorted(r[0] for r in rows)
        return self

    def expr(self, col: str) -> Column:
        m = {v: i for i, v in enumerate(self.classes_)}
        return map_expr(F.col(col), m, default=self.missing_value).cast("int")

    def transform(self, df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
        out_col = out_col or f"{col}_code"
        if len(self.classes_) > MAP_EXPR_MAX:
            m = {v: i for i, v in enumerate(self.classes_)}
            out = with_lookup(df, F.col(col), m, out_col, default=self.missing_value)
            return out.withColumn(out_col, F.col(out_col).cast("int"))
        return df.withColumn(out_col, self.expr(col))
