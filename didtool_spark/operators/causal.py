"""Experiment-analysis operators: CUPED variance reduction and
stratified treatment-effect estimation.

Both are one-aggregation-pass designs: the fitted state (theta, the
stratum means) is a handful of scalars / a tiny stratum table, pushed
back onto rows via broadcast — the same fit-small/transform-wide
shape as the WOE and scaler operators.

- ``cuped_adjust``: Y' = Y - theta * (X - mean(X)) with
  theta = cov(X, Y) / var(X), the industry-standard pre-experiment
  covariate adjustment (Deng et al., WSDM 2013).  Population moments
  (covar_pop / var_pop) on both engines so the oracle replays
  bit-for-round-6.  ``keys`` fits one theta per slice (e.g. per
  country) — a tiny groupBy joined back, still broadcast.
- ``ate_strata``: per-stratum treated/control outcome means and the
  stratum-weighted average treatment effect (post-stratification /
  identical to IPW with within-stratum propensity p_s = n_t / n_s).
  Output keeps the per-stratum table (n, p_treat, mean_t, mean_c,
  effect) plus the overall row under stratum value ``__all__`` so the
  weighting is auditable.

Zero-leakage note: X must be a PRE-treatment covariate; wire it from
the point-in-time features (temporal.asof_join) and the audit in
plans/audit.py applies unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cuped_adjust", "ate_strata", "welch_t"]


def welch_t(
    df: DataFrame,
    treat_col: str,
    y_col: str,
) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic for the
    treated-vs-control outcome difference — the significance companion
    to ``ate_strata``'s effect size.  ONE aggregation pass; output is
    a single row: per-arm n/mean/var (sample variance), the mean
    difference, its standard error, the t statistic, and the
    Welch-Satterthwaite degrees of freedom.  The p-value needs the
    t CDF — left to the caller (scipy when available); at the df this
    produces on real data, |t| > 1.96 reads as p < 0.05.
    """
    t_ = F.col(treat_col)
    agg = df.agg(
        F.sum(t_.cast("long")).alias("n_t"),
        F.sum((~t_).cast("long")).alias("n_c"),
        F.avg(F.when(t_, F.col(y_col))).alias("mean_t"),
        F.avg(F.when(~t_, F.col(y_col))).alias("mean_c"),
        F.var_samp(F.when(t_, F.col(y_col))).alias("var_t"),
        F.var_samp(F.when(~t_, F.col(y_col))).alias("var_c"),
    )
    vt_n = F.col("var_t") / F.col("n_t")
    vc_n = F.col("var_c") / F.col("n_c")
    se = F.sqrt(vt_n + vc_n)
    dof = (vt_n + vc_n) * (vt_n + vc_n) / (
        vt_n * vt_n / (F.col("n_t") - 1) + vc_n * vc_n / (F.col("n_c") - 1)
    )
    return agg.select(
        "n_t", "n_c", "mean_t", "mean_c", "var_t", "var_c",
        (F.col("mean_t") - F.col("mean_c")).alias("diff"),
        se.alias("std_err"),
        ((F.col("mean_t") - F.col("mean_c")) / se).alias("t_stat"),
        dof.alias("dof"),
    )


def cuped_adjust(
    df: DataFrame,
    y_col: str,
    x_col: str,
    keys: Sequence[str] | str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` (default ``{y_col}_cuped``) = Y - theta*(X - E[X])
    and the ``theta`` used (constant per key slice; handy for audit).

    Rows with NULL X are left unadjusted (theta term 0 — the neutral
    choice: they contribute neither to the fit nor to the shift).
    Degenerate slices (var(X) = 0) get theta = 0 rather than NaN.
    """
    kl = [keys] if isinstance(keys, str) else list(keys or [])
    out = out_col or f"{y_col}_cuped"

    stats = df.groupBy(*kl).agg(
        F.covar_pop(x_col, y_col).alias("__cov"),
        F.var_pop(x_col).alias("__var"),
        F.avg(x_col).alias("__mx"),
    )
    theta = F.when(
        F.col("__var") > 0, F.col("__cov") / F.col("__var")
    ).otherwise(F.lit(0.0))
    stats = stats.select(*kl, theta.alias("theta"), "__mx")

    if kl:
        # null-safe equi-join: a NULL key slice is a real slice (it got
        # its own stats row from the groupBy) and must not be dropped
        stats_r = stats.select(
            *[F.col(k).alias(f"__k_{k}") for k in kl], "theta", "__mx"
        )
        cond = None
        for k in kl:
            c = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
            cond = c if cond is None else (cond & c)
        joined = df.join(F.broadcast(stats_r), cond).drop(
            *[f"__k_{k}" for k in kl]
        )
    else:
        joined = df.crossJoin(F.broadcast(stats))
    adj = F.when(
        F.col(x_col).isNotNull(),
        F.col(y_col) - F.col("theta") * (F.col(x_col) - F.col("__mx")),
    ).otherwise(F.col(y_col))
    return joined.withColumn(out, adj).drop("__mx")


def ate_strata(
    df: DataFrame,
    treat_col: str,
    y_col: str,
    stratum_col: str,
    all_label: str = "__all__",
) -> DataFrame:
    """Post-stratified treatment-effect table.

    Per stratum: ``n``, ``n_treat``, ``p_treat``, ``mean_t``,
    ``mean_c``, ``effect`` (mean_t - mean_c; NULL when either arm is
    empty — an empty-arm stratum has no identified effect and is
    excluded from the overall weighting).  The ``all_label`` row
    carries the stratum-size-weighted overall ATE over identified
    strata and the pooled counts; the boolean ``is_overall`` column is
    the unambiguous marker (a data stratum could legitimately be the
    string ``__all__`` — filter on ``is_overall``, not the label).
    """
    cells = df.groupBy(F.col(stratum_col).cast("string").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(treat_col).cast("long")).alias("n_treat"),
        F.avg(F.when(F.col(treat_col), F.col(y_col))).alias("mean_t"),
        F.avg(F.when(~F.col(treat_col), F.col(y_col))).alias("mean_c"),
    )
    cells = cells.select(
        "stratum",
        F.lit(False).alias("is_overall"),
        "n",
        "n_treat",
        (F.col("n_treat") / F.col("n")).alias("p_treat"),
        "mean_t",
        "mean_c",
        (F.col("mean_t") - F.col("mean_c")).alias("effect"),
    )
    # the stratum table is tiny (distinct strata); the overall row is
    # an aggregation of it, not a second pass over the data
    overall = (
        cells.where(F.col("effect").isNotNull())
        .agg(
            F.sum("n").alias("n"),
            F.sum("n_treat").alias("n_treat"),
            (F.sum("n_treat") / F.sum("n")).alias("p_treat"),
            (F.sum(F.col("mean_t") * F.col("n")) / F.sum("n")).alias("mean_t"),
            (F.sum(F.col("mean_c") * F.col("n")) / F.sum("n")).alias("mean_c"),
            (F.sum(F.col("effect") * F.col("n")) / F.sum("n")).alias("effect"),
        )
        .select(
            F.lit(all_label).alias("stratum"),
            F.lit(True).alias("is_overall"),
            "n", "n_treat", "p_treat", "mean_t", "mean_c", "effect",
        )
    )
    return cells.unionByName(overall)
