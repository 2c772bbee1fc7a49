"""Mean/target encoding with leakage control — out-of-fold, leave-one-
out, and smoothed-global variants.

didtool's encoder family (transformer.py: WOE/category/label encoders)
maps categories through statistics of the label; this module adds the
classic mean-target encoding those encoders deliberately avoid, WITH
the leakage control that makes it usable in a training matrix:

- ``method="oof"`` (default): a row is encoded with statistics from the
  OTHER folds only — neither the category mean nor the prior ever sees
  the row's own fold, so the encoding is zero-leakage by construction
  (the north rule's invariant, applied to label leakage instead of
  temporal leakage).
- ``method="loo"``: leave-one-out — the row's own label is subtracted
  from its category's sufficient statistics.
- ``method="global"``: the plain smoothed category mean — ONLY for
  fitting on a train split and transforming other splits
  (``fit_target_encoding`` + ``apply_target_encoding``).

Smoothing is the standard m-estimate: ``(sum_y + m * prior) /
(cnt + m)`` with ``prior`` the (out-of-fold / leave-one-out matched)
global target mean, so rare categories shrink toward the prior instead
of memorizing their few labels.

Scale: ALL categorical columns are melted into one (feature, value
[, fold]) stream — the iv_all single-pass pattern — so the sufficient
statistics for every column come from ONE map-side-combined groupBy
over ONE scan, whatever the column count. The per-(feature, value)
stats tables are category-cardinality-sized; they join back per column
with a broadcast hint (set ``broadcast=False`` for >~100M distinct
categories and let AQE pick the join). No Python in the row path.

Reference parity note: didtool has no target encoder (its WOE encoder
is the risk-modelling analogue); semantics here follow the standard
m-estimate formulation (Micci-Barreca 2001).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "target_encode",
    "fit_target_encoding",
    "apply_target_encoding",
]


def _melt(df: DataFrame, cols: Sequence[str], extra: Sequence[str]) -> DataFrame:
    """(feature, value) long form of the categorical columns — one scan,
    values stringified so one stream carries every column's categories."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("__feat"),
                F.col(c).cast("string").alias("__val"),
            )
            for c in cols
        ]
    )
    return df.select(*extra, F.explode(pairs).alias("__p")).select(
        *extra, F.col("__p.__feat").alias("__feat"), F.col("__p.__val").alias("__val")
    )


def fit_target_encoding(
    df: DataFrame,
    cols: Sequence[str] | str,
    target: str = "y",
    smoothing: float = 20.0,
) -> DataFrame:
    """Fit smoothed-global target encodings on (a train split of) ``df``.

    Returns a small DataFrame ``(feature, value, enc)`` — one row per
    distinct category per column, computed in ONE melted groupBy. NULL
    categories get their own row (NULL is a level, the didtool
    convention). ``enc = (sum_y + m * prior) / (cnt + m)``.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    m = float(smoothing)
    melted = _melt(df, cols, [target])
    stats = melted.groupBy("__feat", "__val").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.col(target).cast("double")).alias("__sum"),
    )
    # per-feature prior from the same table (tiny window, no extra scan)
    tot = stats.groupBy("__feat").agg(
        (F.sum("__sum") / F.sum("__cnt")).alias("__prior")
    )
    return (
        stats.join(tot, "__feat")
        .select(
            F.col("__feat").alias("feature"),
            F.col("__val").alias("value"),
            ((F.col("__sum") + m * F.col("__prior")) / (F.col("__cnt") + m)).alias(
                "enc"
            ),
        )
    )


def apply_target_encoding(
    df: DataFrame,
    mapping: DataFrame,
    cols: Sequence[str] | str | None = None,
    suffix: str = "_te",
    default: float | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Join fitted encodings back onto ``df``: one broadcast equi-join
    per column against the (feature, value, enc) mapping. Unseen
    categories get ``default`` (NULL when None)."""
    if cols is None:
        cols = [r["feature"] for r in mapping.select("feature").distinct().collect()]
    cols = [cols] if isinstance(cols, str) else list(cols)
    out = df
    for c in cols:
        mc = mapping.where(F.col("feature") == c).select(
            F.col("value").alias(f"__val_{c}"), F.col("enc").alias(f"{c}{suffix}")
        )
        mc = F.broadcast(mc) if broadcast else mc
        out = out.join(
            mc, F.col(c).cast("string").eqNullSafe(F.col(f"__val_{c}")), "left"
        ).drop(f"__val_{c}")
        if default is not None:
            out = out.withColumn(
                f"{c}{suffix}", F.coalesce(F.col(f"{c}{suffix}"), F.lit(float(default)))
            )
    return out


def target_encode(
    df: DataFrame,
    cols: Sequence[str] | str,
    target: str = "y",
    method: str = "oof",
    fold_col: str | None = None,
    id_col: str | None = None,
    n_folds: int = 5,
    smoothing: float = 20.0,
    suffix: str = "_te",
    broadcast: bool = True,
) -> DataFrame:
    """Add ``<col><suffix>`` encoded columns to ``df``.

    method="oof": fold assignment comes from ``fold_col`` if given, else
    ``pmod(xxhash64(id_col), n_folds)`` (``id_col`` required then —
    deterministic, cluster-size-independent). Row encoding uses ONLY
    out-of-fold statistics::

        enc = (sum_cat - sum_cat_fold + m * prior_oof)
              / (cnt_cat - cnt_cat_fold + m)
        prior_oof = (sum_all - sum_fold) / (cnt_all - cnt_fold)

    A category seen only in the row's own fold encodes to prior_oof
    (pure shrinkage); with ``smoothing=0`` it is NULL.

    method="loo": the row's own label is removed::

        enc = (sum_cat - y + m * prior) / (cnt_cat - 1 + m)

    (prior stays global: removing one row moves it by O(1/n)).
    Singleton categories encode to the prior (NULL when smoothing=0).

    method="global": the fit/apply pair in one call — ONLY safe when
    ``df`` is not the split the statistics were fitted on; prefer
    ``fit_target_encoding`` + ``apply_target_encoding`` across splits.

    Plan: one melted map-side-combined groupBy over one scan covers
    every column (+ the per-(value, fold) split for "oof"); the stats
    join back per column on the category value — broadcastable, the
    stats tables are category-cardinality-sized. "loo" needs no join at
    all beyond the same stats (the row's own label is subtracted
    row-side). No window over the full data, no Python in the row path.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    m = float(smoothing)
    y = F.col(target).cast("double")

    if method == "global":
        mapping = fit_target_encoding(df, cols, target, smoothing)
        return apply_target_encoding(df, mapping, cols, suffix, broadcast=broadcast)

    if method == "loo":
        stats = (
            _melt(df, cols, [target])
            .groupBy("__feat", "__val")
            .agg(
                F.count(F.lit(1)).alias("__cnt"),
                F.sum(F.col(target).cast("double")).alias("__sum"),
            )
        )
        tot = stats.groupBy("__feat").agg(
            (F.sum("__sum") / F.sum("__cnt")).alias("__prior")
        )
        stats = stats.join(tot, "__feat")
        out = df
        for c in cols:
            sc = stats.where(F.col("__feat") == c).select(
                F.col("__val").alias(f"__val_{c}"),
                F.col("__cnt").alias(f"__cnt_{c}"),
                F.col("__sum").alias(f"__sum_{c}"),
                F.col("__prior").alias(f"__prior_{c}"),
            )
            sc = F.broadcast(sc) if broadcast else sc
            out = out.join(
                sc, F.col(c).cast("string").eqNullSafe(F.col(f"__val_{c}")), "left"
            )
            num = F.col(f"__sum_{c}") - y + m * F.col(f"__prior_{c}")
            den = F.col(f"__cnt_{c}") - 1 + m
            out = out.withColumn(
                f"{c}{suffix}", F.when(den > 0, F.try_divide(num, den))
            ).drop(f"__val_{c}", f"__cnt_{c}", f"__sum_{c}", f"__prior_{c}")
        return out

    if method != "oof":
        raise ValueError(f"unknown target_encode method {method!r}")

    if fold_col is None:
        if id_col is None:
            raise ValueError("method='oof' needs fold_col or id_col")
        df = df.withColumn(
            "__fold", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_folds)).cast("int")
        )
        fold_col = "__fold"

    melted = _melt(df, cols, [target, fold_col])
    per_fold = melted.groupBy("__feat", "__val", fold_col).agg(
        F.count(F.lit(1)).alias("__fcnt"),
        F.sum(y).alias("__fsum"),
    )
    per_cat = per_fold.groupBy("__feat", "__val").agg(
        F.sum("__fcnt").alias("__cnt"), F.sum("__fsum").alias("__sum")
    )
    # NULL is a category level: the value join must be null-safe (a
    # name-based equi-join would silently drop every NULL-category row)
    pc = per_cat.select(
        F.col("__feat").alias("__feat2"),
        F.col("__val").alias("__val2"),
        "__cnt",
        "__sum",
    )
    cat_fold = per_fold.join(
        pc,
        (F.col("__feat") == F.col("__feat2"))
        & F.col("__val").eqNullSafe(F.col("__val2")),
    ).drop("__feat2", "__val2")
    # fold-level prior table: n_folds rows per feature
    fold_tot = per_fold.groupBy("__feat", fold_col).agg(
        F.sum("__fcnt").alias("__tfcnt"), F.sum("__fsum").alias("__tfsum")
    )
    all_tot = fold_tot.groupBy("__feat").agg(
        F.sum("__tfcnt").alias("__tcnt"), F.sum("__tfsum").alias("__tsum")
    )
    fold_tot = fold_tot.join(all_tot, "__feat").select(
        "__feat",
        fold_col,
        F.try_divide(
            F.col("__tsum") - F.col("__tfsum"), F.col("__tcnt") - F.col("__tfcnt")
        ).alias("__prior"),
    )
    enc = cat_fold.join(fold_tot, ["__feat", fold_col]).select(
        "__feat",
        "__val",
        fold_col,
        F.when(
            (F.col("__cnt") - F.col("__fcnt") + m) > 0,
            F.try_divide(
                F.col("__sum") - F.col("__fsum") + m * F.col("__prior"),
                F.col("__cnt") - F.col("__fcnt") + m,
            ),
        ).alias("__enc"),
    )

    out = df
    for c in cols:
        ec = enc.where(F.col("__feat") == c).select(
            F.col("__val").alias(f"__val_{c}"),
            F.col(fold_col).alias(f"__fold_{c}"),
            F.col("__enc").alias(f"{c}{suffix}"),
        )
        ec = F.broadcast(ec) if broadcast else ec
        out = out.join(
            ec,
            F.col(c).cast("string").eqNullSafe(F.col(f"__val_{c}"))
            & (F.col(fold_col) == F.col(f"__fold_{c}")),
            "left",
        ).drop(f"__val_{c}", f"__fold_{c}")
    return out.drop("__fold") if fold_col == "__fold" else out
