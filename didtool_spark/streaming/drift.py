"""Streaming drift monitoring: didtool's PSI as a live monitor.

The reference computes PSI between an expected (training) frame and an
actual (serving) frame after the fact (metric.py:126-260). On a live
pipeline the natural form is *per time window*: fit the reference
distribution once, then watch the stream and emit one PSI per window.

Scale split: the STREAMING side does only the heavy, watermark-bounded
aggregation — per-window per-bin counts, so state is O(n_bins) per open
window and the shuffle carries (window, bin) keys, never rows. The
per-window PSI fold (a dozen numbers per window) is pure driver math
over the tiny sink table, reusing the exact same floored-rate formula
as the batch ``operators.metrics.psi`` — the two are asserted equal in
tests.

At 10^12 turns/day this is one streaming groupBy with map-side partial
aggregation; n_bins x windows is the only state, independent of input
rate.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.binexpr import bin_expr
from ..operators.binning import step_edges
from ..operators.metrics import DEFAULT_BINS, _rates


class PsiMonitor:
    """Fit once on the expected/reference frame; then either
    ``binned_counts`` (streaming aggregation to a sink) + ``psi_table``
    (per-window PSI over the sink), or ``psi_now`` for a one-shot batch
    check. Continuous features only — same step-edge rule as
    metrics.psi (edges fitted on EXPECTED, no empty-bin merge,
    metric.py:190-193)."""

    def __init__(
        self,
        col: str,
        n_bins: int = DEFAULT_BINS,
        is_continuous: bool = True,
        max_categories: int = 100,
    ):
        self.col = col
        self.n_bins = n_bins
        self.is_continuous = is_continuous
        self.max_categories = max_categories
        self.edges: list[float] | None = None
        self.vocab: dict[str, int] | None = None
        self.e_counts: dict[int, int] | None = None
        self._dtype: str = "double"

    # ------------------------------------------------------------- fit
    def fit(self, expected: DataFrame) -> "PsiMonitor":
        self._dtype = expected.schema[self.col].dataType.simpleString()
        if self.is_continuous:
            self.edges = step_edges(
                expected, self.col, self.n_bins, remove_empty_bins=False
            )
            self.e_counts = {
                r["__b"]: r["count"]
                for r in expected.select(self._bin().alias("__b"))
                .groupBy("__b")
                .count()
                .collect()
            }
            return self
        # categorical: the streaming state must stay bounded, so the
        # monitor fits a top-``max_categories`` vocabulary by expected
        # frequency (value -> integer code); everything else — including
        # categories first seen on the stream — folds into one OTHER
        # code. With cardinality <= max_categories and no unseen stream
        # values this equals batch psi(is_continuous=False) exactly
        # (OTHER is 0 on both sides and contributes 0 through the
        # floors); past the cap it is the state-bounded approximation.
        rows = (
            expected.select(self._cat_expr().alias("__x"))
            .groupBy("__x")
            .count()
            .orderBy(F.desc("count"), "__x")
            .limit(self.max_categories)
            .collect()
        )
        self.vocab = {r["__x"]: i for i, r in enumerate(rows)}
        top_total = sum(r["count"] for r in rows)
        grand = expected.count()
        self.e_counts = {i: r["count"] for i, r in enumerate(rows)}
        self.e_counts[len(self.vocab)] = grand - top_total  # OTHER
        return self

    def _cat_expr(self):
        # the SAME key normalization as batch metrics.psi ('nan'
        # sentinel, int-normalized numerics — '1' not '1.0'), so
        # psi_now/psi_table equals batch psi for every column dtype,
        # not just plain strings
        from ..operators.metrics import handle_categorical_expr

        return handle_categorical_expr(F.col(self.col), self._dtype)

    def _bin(self):
        if self.is_continuous:
            if self.edges is None:
                raise ValueError("fit() the monitor on the expected frame first")
            return bin_expr(F.col(self.col).try_cast("double"), self.edges)
        if self.vocab is None:
            raise ValueError("fit() the monitor on the expected frame first")
        from ..functions.exprs import map_expr

        return map_expr(
            self._cat_expr(), self.vocab, default=len(self.vocab)
        ).cast("int")

    # ------------------------------------------------- streaming side
    def binned_counts(
        self,
        stream: DataFrame,
        ts_col: str = "ts",
        window_duration: str = "1 hour",
        watermark: str = "2 hours",
    ) -> DataFrame:
        """(window_start, window_end, bin, count) per tumbling window —
        append-mode compatible (rows emit when the watermark closes the
        window)."""
        if self.e_counts is None:
            raise ValueError("fit() the monitor on the expected frame first")
        return (
            stream.withWatermark(ts_col, watermark)
            .groupBy(
                F.window(ts_col, window_duration).alias("w"),
                self._bin().alias("bin"),
            )
            .agg(F.count(F.lit(1)).alias("count"))
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "bin",
                "count",
            )
        )

    # ----------------------------------------------------- psi folds
    def _psi_of_counts(self, a_counts: dict[int, int]) -> float:
        # EXACTLY the batch psi fold (metrics.psi): NA key first iff
        # either side saw NaN, 1e-10 rate floors, sum (a-e)*ln(a/e)
        if self.is_continuous:
            has_nan = (-1 in self.e_counts) or (-1 in a_counts)
            keys = ([-1] if has_nan else []) + list(range(len(self.edges) - 1))
        else:
            keys = list(range(len(self.vocab) + 1))  # codes + OTHER
        e_rate = _rates(self.e_counts, keys, sum(self.e_counts.values()))
        a_rate = _rates(a_counts, keys, sum(a_counts.values()))
        return sum((a - e) * math.log(a / e) for a, e in zip(a_rate, e_rate))

    def psi_table(self, counts: DataFrame) -> pd.DataFrame:
        """Per-window PSI from a (window_start, window_end, bin, count)
        table (the streaming sink). The input is windows x n_bins rows —
        driver-sized by construction."""
        pdf = counts.toPandas()
        out = []
        for (ws, we), g in pdf.groupby(["window_start", "window_end"], sort=True):
            a_counts = dict(zip(g["bin"].astype(int), g["count"].astype(int)))
            out.append(
                {
                    "window_start": ws,
                    "window_end": we,
                    "n_rows": int(g["count"].sum()),
                    "psi": self._psi_of_counts(a_counts),
                }
            )
        return pd.DataFrame(out)

    def psi_now(self, actual: DataFrame) -> float:
        """One-shot batch PSI of ``actual`` against the fitted
        reference — same number metrics.psi(expected, actual) returns."""
        a_counts = {
            r["__b"]: r["count"]
            for r in actual.select(self._bin().alias("__b"))
            .groupBy("__b")
            .count()
            .collect()
        }
        return self._psi_of_counts(a_counts)


class CalibrationMonitor:
    """Live score-calibration monitor: the batch reliability table /
    Brier / ECE / MCE (operators/calibration.py) per event-time window.

    Scale split, same as PsiMonitor: the STREAMING side runs ONE
    watermark-bounded groupBy on (window, bin) carrying four sufficient
    statistics (count, sum score, sum label, sum squared error) with
    map-side partial aggregation — state is O(n_bins) per open window,
    independent of input rate.  The per-window metric fold is driver
    math over the windows x n_bins sink table and computes EXACTLY the
    batch ``calibration_metrics`` numbers (asserted equal in tests).
    """

    def __init__(self, score_col: str, label_col: str, n_bins: int = 10):
        self.score_col = score_col
        self.label_col = label_col
        self.n_bins = int(n_bins)

    def _bin(self):
        s = F.col(self.score_col).cast("double")
        return F.least(
            F.floor(s * F.lit(self.n_bins)), F.lit(self.n_bins - 1)
        ).cast("long")

    def windowed_bins(
        self,
        stream: DataFrame,
        ts_col: str = "ts",
        window_duration: str = "1 hour",
        watermark: str = "2 hours",
    ) -> DataFrame:
        """(window_start, window_end, bin, n, sum_s, sum_y, sum_sq) per
        tumbling window — append-mode compatible.  NULL scores/labels
        drop (the batch reliability_table contract)."""
        s = F.col(self.score_col).cast("double")
        y = F.col(self.label_col).cast("double")
        return (
            stream.where(s.isNotNull() & y.isNotNull())
            .withWatermark(ts_col, watermark)
            .groupBy(
                F.window(ts_col, window_duration).alias("w"),
                self._bin().alias("bin"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(s).alias("sum_s"),
                F.sum(y).alias("sum_y"),
                F.sum(F.pow(s - y, 2)).alias("sum_sq"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "bin", "n", "sum_s", "sum_y", "sum_sq",
            )
        )

    @staticmethod
    def _fold(g: pd.DataFrame) -> dict:
        n = g["n"].sum()
        gaps = (g["sum_y"] / g["n"] - g["sum_s"] / g["n"]).abs()
        return {
            "n_rows": int(n),
            "brier": float(g["sum_sq"].sum() / n),
            "ece": float((gaps * g["n"]).sum() / n),
            "mce": float(gaps.max()),
        }

    def calibration_table(self, counts: DataFrame) -> pd.DataFrame:
        """Per-window (n_rows, brier, ece, mce) from the streaming sink
        — windows x n_bins rows, driver-sized by construction."""
        pdf = counts.toPandas()
        out = []
        for (ws, we), g in pdf.groupby(
            ["window_start", "window_end"], sort=True
        ):
            out.append(
                {"window_start": ws, "window_end": we, **self._fold(g)}
            )
        return pd.DataFrame(out)

    def now(self, scored: DataFrame) -> dict:
        """One-shot batch check — the same numbers
        calibration_metrics(scored, ...) returns."""
        s = F.col(self.score_col).cast("double")
        y = F.col(self.label_col).cast("double")
        g = (
            scored.where(s.isNotNull() & y.isNotNull())
            .groupBy(self._bin().alias("bin"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(s).alias("sum_s"),
                F.sum(y).alias("sum_y"),
                F.sum(F.pow(s - y, 2)).alias("sum_sq"),
            )
            .toPandas()
        )
        return self._fold(g)
