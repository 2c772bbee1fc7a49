"""Probability-calibration diagnostics and inter-labeler agreement.

Reference parity: didtool's metric.py stops at discrimination metrics
(AUC/KS, reference metric.py:313-420); a scoring pipeline also needs
CALIBRATION — does a predicted 0.8 mean 80%? — and, when labels come
from multiple heuristic labelers (plans/labels.py, transcript outcome
rules), a chance-corrected agreement measure between them.  Both are
standard, fully aggregative statistics.

Scale design: everything here is one or two map-side-combinable
groupBys over (bin) / (label-pair) keys — state is n_bins or
n_classes^2 rows however many input rows there are.  No windows, no
sort, no Python; the outputs are tiny DataFrames (reliability table,
one-row metric frames) safe to join or collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["reliability_table", "calibration_metrics", "cohen_kappa"]


def _bin_expr(score: Column, n_bins: int) -> Column:
    # equal-width bins on [0, 1]; score == 1.0 folds into the top bin
    return F.least(
        F.floor(score * F.lit(n_bins)), F.lit(n_bins - 1)
    ).cast("long")


def reliability_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin calibration table: ``(bin, n, avg_score, event_rate,
    gap)`` over equal-width score bins on [0, 1].

    ``gap = |event_rate - avg_score|`` is the per-bin calibration
    error; rows with a NULL score or label are excluded (they belong to
    neither a bin nor a rate).  One map-side-combined groupBy.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    return (
        df.where(s.isNotNull() & y.isNotNull())
        .groupBy(_bin_expr(s, n_bins).alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(s).alias("avg_score"),
            F.avg(y).alias("event_rate"),
        )
        .withColumn("gap", F.abs(F.col("event_rate") - F.col("avg_score")))
    )


def calibration_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """One-row frame: ``(n, brier, ece, mce)``.

    Brier is binless (``avg((score - label)^2)``); ECE is the
    bin-count-weighted mean absolute gap and MCE the max gap over the
    same equal-width bins as :func:`reliability_table`.  Two aggregate
    jobs over tiny state.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.where(s.isNotNull() & y.isNotNull())
    brier = base.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.pow(s - y, 2)).alias("brier")
    )
    bins = reliability_table(df, score_col, label_col, n_bins)
    binned = bins.agg(
        (F.sum(F.col("n") * F.col("gap")) / F.sum("n")).alias("ece"),
        F.max("gap").alias("mce"),
    )
    return brier.crossJoin(binned)


def cohen_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Chance-corrected agreement between two label columns (Cohen's
    kappa, multiclass): one-row frame ``(n, po, pe, kappa)``.

    ``po`` = observed agreement rate, ``pe`` = expected agreement of
    independent labelers with the same marginals, ``kappa =
    (po - pe) / (1 - pe)`` (NULL when ``pe == 1`` — degenerate
    single-class marginals).  Rows where either label is NULL are
    excluded.  The contingency table is one groupBy with
    n_classes^2 rows; marginal products reduce over that table, never
    the input.
    """
    a = F.col(col_a).cast("string")
    b = F.col(col_b).cast("string")
    c = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    tot = c.agg(
        F.sum("__n").alias("n"),
        (
            F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n")).otherwise(0))
            / F.sum("__n")
        ).alias("po"),
    )
    ma = c.groupBy("__a").agg(F.sum("__n").alias("__na"))
    mb = c.groupBy("__b").agg(F.sum("__n").alias("__nb"))
    pe = (
        ma.join(mb, ma["__a"] == mb["__b"])
        .agg(F.sum(F.col("__na").cast("double") * F.col("__nb")).alias("__s"))
    )
    out = tot.crossJoin(pe).select(
        "n",
        "po",
        (F.col("__s") / (F.col("n").cast("double") * F.col("n"))).alias("pe"),
    )
    return out.withColumn(
        "kappa",
        F.when(
            F.col("pe") < 1.0, (F.col("po") - F.col("pe")) / (1.0 - F.col("pe"))
        ),
    )
