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

__all__ = [
    "reliability_table",
    "calibration_metrics",
    "cohen_kappa",
    "fit_isotonic",
    "apply_isotonic",
    "isotonic_fit_points",
    "distribution_distance",
    "drift_timeline",
]


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


def fit_isotonic(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 256,
) -> dict:
    """Fit a monotone (non-decreasing) calibration map score -> P(y=1)
    by isotonic regression: ONE min/max aggregate + ONE map-side-
    combined binned groupBy shuffle n_bins rows to the driver, where
    pool-adjacent-violators runs over the aggregated bins (weighted by
    bin count — exactly PAV on the rows, since rows in a bin share an
    x up to the bin width).

    Returns a small plain dict model: ``{"lo", "hi", "n_bins",
    "values"}`` with one fitted value per occupied-or-interpolated bin
    (empty bins inherit the previous bin's value — step semantics).
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.where(s.isNotNull() & y.isNotNull())
    mm = base.agg(F.min(s).alias("lo"), F.max(s).alias("hi")).collect()[0]
    lo, hi = mm["lo"], mm["hi"]
    if lo is None:
        raise ValueError("no non-NULL (score, label) rows to fit on")
    width = (hi - lo) or 1.0
    b = F.least(
        F.floor((s - F.lit(lo)) / F.lit(width) * n_bins), F.lit(n_bins - 1)
    ).cast("int")
    rows = (
        base.groupBy(b.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(y).alias("sy"))
        .collect()
    )
    by_bin = {r["b"]: (r["n"], r["sy"]) for r in rows}
    return _isotonic_from_bins(by_bin, float(lo), float(hi), n_bins)


def _isotonic_from_bins(by_bin: dict, lo: float, hi: float, n_bins: int) -> dict:
    """PAV over aggregated (bin -> (n, sum_y)) — shared by the
    DataFrame fit and the pure-Python twin (isotonic_fit_points) that
    oracle replays are built from."""
    occ = sorted(by_bin)
    rates = [by_bin[i][1] / by_bin[i][0] for i in occ]
    weights = [by_bin[i][0] for i in occ]
    # PAV with explicit bin spans so re-expansion is exact
    blocks = []  # [value, weight, count_of_bins]
    for r, w in zip(rates, weights):
        blocks.append([float(r), float(w), 1])
        while len(blocks) > 1 and blocks[-2][0] >= blocks[-1][0]:
            v2, w2, c2 = blocks.pop()
            v1, w1, c1 = blocks.pop()
            blocks.append(
                [(v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2, c1 + c2]
            )
    fitted_occ = []
    for v, _, c in blocks:
        fitted_occ.extend([v] * c)
    fit_by_bin = dict(zip(occ, fitted_occ))
    values, last = [], fitted_occ[0]
    for i in range(n_bins):
        last = fit_by_bin.get(i, last)
        values.append(last)
    return {"lo": lo, "hi": hi, "n_bins": n_bins, "values": values}


def isotonic_fit_points(xs, ys, n_bins: int = 256) -> dict:
    """Pure-Python twin of :func:`fit_isotonic` over in-memory points —
    IDENTICAL arithmetic (same binning expression, same PAV), used to
    inline fitted values into oracle SQL and asserted equal to the
    DataFrame fit in tests."""
    import math

    pts = [(float(x), float(y)) for x, y in zip(xs, ys)
           if x is not None and y is not None]
    if not pts:
        raise ValueError("no non-NULL (score, label) points to fit on")
    lo = min(x for x, _ in pts)
    hi = max(x for x, _ in pts)
    width = (hi - lo) or 1.0
    by_bin: dict = {}
    for x, y in pts:
        b = min(int(math.floor((x - lo) / width * n_bins)), n_bins - 1)
        n, sy = by_bin.get(b, (0, 0.0))
        by_bin[b] = (n + 1, sy + y)
    return _isotonic_from_bins(by_bin, lo, hi, n_bins)


def apply_isotonic(
    df: DataFrame,
    model: dict,
    score_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Apply a fitted isotonic map as pure codegen: bin the score on
    the fitted [lo, hi] grid (clipping outside — the sklearn
    out-of-domain convention) and index a LITERAL value array.  NULL
    scores stay NULL."""
    out_col = out_col or f"{score_col}_cal"
    s = F.col(score_col).cast("double")
    lo, hi, n = model["lo"], model["hi"], model["n_bins"]
    width = (hi - lo) or 1.0
    b = F.least(
        F.greatest(
            F.floor((s - F.lit(lo)) / F.lit(width) * n), F.lit(0)
        ),
        F.lit(n - 1),
    ).cast("int")
    arr = F.array(*[F.lit(float(v)) for v in model["values"]])
    return df.withColumn(
        out_col, F.when(s.isNotNull(), F.element_at(arr, b + 1))
    )


def distribution_distance(
    expected: DataFrame,
    actual: DataFrame,
    col: str,
    n_bins: int = 10,
) -> dict:
    """Binned two-sample distribution distances beyond PSI: returns
    ``{"psi", "ks", "jsd", "tvd", "n_expected", "n_actual"}``.

    Bins are the EXPECTED side's equal-width step edges (the
    metrics.psi leakage-safe rule: the serving side never influences
    the binning); both sides reduce to n_bins counts in one
    map-side-combined groupBy each, and every distance is driver math
    over those counts:

    - psi — the didtool formula (1e-10 rate floors, metric.py:126-260);
    - ks  — max |cumulative difference| (binned two-sample
      Kolmogorov-Smirnov statistic; resolution 1/n_bins);
    - jsd — Jensen-Shannon divergence, natural log (bounded ln 2);
    - tvd — total variation distance = half the L1 gap.

    NaN/NULL values share the reference's NA bin on both sides.
    """
    import math

    from ..functions.binexpr import bin_expr
    from .binning import step_edges

    edges = step_edges(expected, col, n_bins, remove_empty_bins=False)

    def counts(frame):
        return {
            r["__b"]: r["count"]
            for r in frame.select(
                bin_expr(F.col(col).try_cast("double"), edges).alias("__b")
            )
            .groupBy("__b")
            .count()
            .collect()
        }

    e_counts, a_counts = counts(expected), counts(actual)
    has_nan = (-1 in e_counts) or (-1 in a_counts)
    keys = ([-1] if has_nan else []) + list(range(len(edges) - 1))
    ne = sum(e_counts.values()) or 1
    na = sum(a_counts.values()) or 1
    e_rate = [max(e_counts.get(k, 0) / ne, 1e-10) for k in keys]
    a_rate = [max(a_counts.get(k, 0) / na, 1e-10) for k in keys]
    psi_v = sum((a - e) * math.log(a / e) for a, e in zip(a_rate, e_rate))
    ce = ca = 0.0
    ks = 0.0
    for e, a in zip(e_rate, a_rate):
        ce += e
        ca += a
        ks = max(ks, abs(ce - ca))
    jsd = 0.0
    for e, a in zip(e_rate, a_rate):
        m = (e + a) / 2.0
        jsd += 0.5 * (e * math.log(e / m) + a * math.log(a / m))
    tvd = 0.5 * sum(abs(a - e) for a, e in zip(a_rate, e_rate))
    return {
        "psi": psi_v, "ks": ks, "jsd": jsd, "tvd": tvd,
        "n_expected": int(ne), "n_actual": int(na),
    }


def drift_timeline(
    expected: DataFrame,
    actual: DataFrame,
    col: str,
    period: str = "week",
    n_bins: int = 10,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-period drift report: one row per ``period`` bucket of the
    ACTUAL stream with ``(period_ts, n, psi, ks, jsd, tvd)`` against
    the EXPECTED distribution — "PSI by week", the standard production
    drift dashboard, as ONE distributed plan.

    Binning follows the metrics.psi leakage-safe rule (the expected
    side's equal-width step edges with remove_empty_bins=False; the
    serving stream never influences the binning; 1e-10 rate floors).
    Unlike :func:`distribution_distance` (driver math over one count
    pair) every period's distances here are computed IN SPARK: the
    actual stream reduces to (period, bin) counts in one map-side
    combined groupBy, the expected side to n_bins rates broadcast onto
    the dense period x bin grid, KS's cumulative gap is a window over
    n_bins rows per period, and one final groupBy(period) folds the
    rates into all four distances — the whole report is two aggregation
    passes over the actual stream regardless of how many periods it
    spans, and is exactly SQL-replayable (gate query `drift_timeline`).
    NaN/NULL values share the reference's NA bin (-1) on both sides.
    """
    from pyspark.sql import Window

    from ..functions.binexpr import bin_expr
    from .binning import step_edges

    if period not in ("minute", "hour", "day", "week", "month",
                      "quarter", "year"):
        # Spark's date_trunc returns NULL for an unknown format — a
        # typo would silently collapse the timeline into one NULL row
        raise ValueError(f"unknown period {period!r}")

    edges = step_edges(expected, col, n_bins, remove_empty_bins=False)
    bexpr = bin_expr(F.col(col).try_cast("double"), edges)

    e_counts = (
        expected.select(bexpr.alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("ec"))
    )
    a_counts = (
        actual.select(
            F.date_trunc(period, F.col(ts_col)).alias("period_ts"),
            bexpr.alias("b"),
        )
        .groupBy("period_ts", "b").agg(F.count(F.lit(1)).alias("ac"))
    )
    # dense grid: every (period, bin) — bins the NA bin included when
    # either side ever produced it, so the two rate vectors align
    bins = (
        e_counts.select("b")
        .unionByName(a_counts.select("b")).distinct()
    )
    periods = a_counts.groupBy("period_ts").agg(
        F.sum("ac").cast("long").alias("n")
    )
    # expected total stays IN-plan (1-row broadcast from the same
    # count table) — a driver-side expected.count() here would cost an
    # extra full scan of the expected stream at call time
    etot = e_counts.agg(
        F.greatest(F.sum("ec"), F.lit(1)).cast("double").alias("__etot")
    )
    grid = (
        periods.crossJoin(F.broadcast(bins))
        .crossJoin(F.broadcast(etot))
        .join(F.broadcast(e_counts), "b", "left")
        .join(a_counts, ["period_ts", "b"], "left")
        .select(
            "period_ts", "b", "n",
            F.greatest(
                F.coalesce(F.col("ec"), F.lit(0)) / F.col("__etot"),
                F.lit(1e-10),
            ).alias("er"),
            F.greatest(
                F.coalesce(F.col("ac"), F.lit(0)) / F.col("n"),
                F.lit(1e-10),
            ).alias("ar"),
        )
    )
    w = (
        Window.partitionBy("period_ts").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grid = grid.withColumn(
        "gap", F.abs(F.sum("er").over(w) - F.sum("ar").over(w))
    )
    m = (F.col("er") + F.col("ar")) / 2.0
    return grid.groupBy("period_ts").agg(
        F.max("n").alias("n"),
        F.sum((F.col("ar") - F.col("er")) * F.log(F.col("ar") / F.col("er")))
        .alias("psi"),
        F.max("gap").alias("ks"),
        F.sum(
            0.5 * (F.col("er") * F.log(F.col("er") / m)
                   + F.col("ar") * F.log(F.col("ar") / m))
        ).alias("jsd"),
        (0.5 * F.sum(F.abs(F.col("ar") - F.col("er")))).alias("tvd"),
    )
