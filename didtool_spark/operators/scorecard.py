"""Probability -> integer credit score (reference didtool/scorecard.py).

fit: one ``groupBy(prob-bin)`` aggregation -> n_bins-row table on the
driver -> the reference's sequential odds adjustment + piecewise-linear
anchor math (scorecard.py:104-227) in plain numpy.
transform: pure arithmetic expressions — bin lookup via literal map,
``round(slope*p + intercept)`` cast int (scorecard.py:77-98).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..functions.exprs import map_expr


class ScoreCardTransformer:
    def __init__(
        self,
        n_bins: int = 20,
        standard_score: int = 500,
        standard_odds: float = 0.01,
        pdo: int = 20,
        bad_flag: bool = True,
    ):
        self.n_bins = n_bins
        self.standard_score = standard_score
        self.standard_odds = standard_odds
        self.pdo = pdo
        self.bad_flag = bad_flag
        self.step = 1.0 / n_bins
        self.binning_df: pd.DataFrame | None = None
        self.mapping_df: pd.DataFrame | None = None

    # ----------------------------------------------------------- fit
    def fit(self, df: DataFrame, prob_col: str, label_col: str):
        p = F.col(prob_col).cast("double")
        if self.bad_flag:  # scorecard.py:111-113
            p = F.lit(1.0) - p
        b = F.floor(p / F.lit(self.step)).cast("int")
        rows = (
            df.select(b.alias("__b"), F.col(label_col).cast("double").alias("__y"))
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("hits"), F.sum("__y").alias("ones"))
            .collect()
        )
        hits = np.zeros(self.n_bins)
        ones = np.zeros(self.n_bins)
        for r in rows:
            if r["__b"] is None:
                continue
            i = int(r["__b"])
            # bins outside the 0..n_bins-1 table (e.g. p exactly 1.0 ->
            # bin n_bins) are dropped, matching the reference's index
            # alignment on range(n_bins) (scorecard.py:115-121)
            if i < 0 or i >= self.n_bins:
                continue
            hits[i] += r["hits"]
            ones[i] += r["ones"]

        if self.bad_flag:  # scorecard.py:122-131
            bad = ones
            good = hits - ones
        else:
            good = ones
            bad = hits - ones

        with np.errstate(divide="ignore", invalid="ignore"):
            odds = good / bad
        binning = pd.DataFrame(
            {
                "hits": hits,
                "bad_hits": bad,
                "good_hits": good,
                "odds": odds,
            },
            index=range(self.n_bins),
        )
        binning = self._adjust_odds(binning)

        binning["prob_l"] = np.arange(0, 1, self.step)[: self.n_bins]
        binning["prob_r"] = binning["prob_l"] + self.step
        if self.bad_flag:  # scorecard.py:139-143
            binning = binning.sort_values("prob_l", ascending=False)
            binning["prob_l"] = np.arange(0, 1, self.step)[: self.n_bins]
            binning["prob_r"] = binning["prob_l"] + self.step
            binning = binning.reset_index(drop=True)

        binning["score"] = [
            int(self.standard_score + self.pdo * math.log2(x / self.standard_odds))
            for x in binning["adjusted_odds"]
        ]
        binning["mean_prob"] = (binning["prob_l"] + binning["prob_r"]) / 2
        self.binning_df = binning
        self.mapping_df = self._calc_mapping_df()
        return self

    def _adjust_odds(self, df: pd.DataFrame) -> pd.DataFrame:
        """scorecard.py:153-195 verbatim logic."""
        odds = df["odds"].fillna(0).values.astype(float)
        odds[np.isinf(odds)] = 0

        max_odds = odds.max()
        max_odds_index = int(odds.argmax())
        positive = odds[odds > 0]
        min_odds = positive.min() if len(positive) else 0.0
        min_odds_index = int(np.where(odds == min_odds)[0][0]) if len(positive) else 0

        is_zero_good = False
        for i in range(min_odds_index - 1, -1, -1):
            if df["good_hits"][i] == 0.0:
                is_zero_good = True
            if is_zero_good:
                min_odds /= 2
                odds[i] = min_odds

        is_zero_bad = False
        for i in range(max_odds_index + 1, self.n_bins):
            if df["bad_hits"][i] == 0.0:
                is_zero_bad = True
            if is_zero_bad:
                max_odds *= 2
                odds[i] = max_odds

        for i in range(min_odds_index + 1, max_odds_index - 1):
            if odds[i] == 0.0:
                if odds[i + 1] != 0.0:
                    odds[i] = (odds[i - 1] + odds[i + 1]) / 2
                else:
                    odds[i] = odds[i - 1]

        df["adjusted_odds"] = odds
        return df

    def _calc_mapping_df(self) -> pd.DataFrame:
        """scorecard.py:197-227: anchors at (mean_prob, score), piecewise
        slope/intercept per transform bin (n_bins+1 segments)."""
        nb = self.n_bins
        prob_l = np.empty(nb + 1, dtype=object)
        score_l = np.empty(nb + 1, dtype=object)
        prob_r = np.empty(nb + 1, dtype=object)
        score_r = np.empty(nb + 1, dtype=object)
        prob_l[1:] = self.binning_df["mean_prob"].values
        score_l[1:] = self.binning_df["score"].values
        prob_r[:nb] = self.binning_df["mean_prob"].values
        score_r[:nb] = self.binning_df["score"].values
        prob_l[0] = 0.0
        prob_r[nb] = 1.0
        if self.bad_flag:
            score_l[0] = max(self.binning_df["score"]) + self.pdo
            score_r[nb] = min(self.binning_df["score"]) - self.pdo / 2
        else:
            score_l[0] = min(self.binning_df["score"]) - self.pdo
            score_r[nb] = max(self.binning_df["score"]) + self.pdo / 2

        den = (prob_r - prob_l).astype(float)
        slope = (score_r - score_l).astype(float) / den
        intercept = (
            prob_r.astype(float) * score_l.astype(float)
            - prob_l.astype(float) * score_r.astype(float)
        ) / den
        return pd.DataFrame({"slope": slope, "intercept": intercept})

    # ----------------------------------------------------- transform
    def expr(self, prob_col: str) -> Column:
        """scorecard.py:92-97: bin = int((p + step/2)/step);
        score = int(round(slope*p + intercept))."""
        p = F.col(prob_col).cast("double")
        b = F.floor((p + self.step / 2.0) / F.lit(self.step)).cast("int")
        slope = map_expr(b, dict(enumerate(self.mapping_df["slope"])))
        intercept = map_expr(b, dict(enumerate(self.mapping_df["intercept"])))
        # bround = half-even; python round() is half-even too
        return F.bround(slope * p + intercept, 0).cast("int")

    def transform(self, df: DataFrame, prob_col: str, out_col: str = "score") -> DataFrame:
        return df.withColumn(out_col, self.expr(prob_col))

    def export_mapping(self, out_path: str) -> None:
        """scorecard.py:260-264: persist the piecewise mapping."""
        self.mapping_df.to_csv(out_path, index=False)

    def plot_bins(self, out_path: str | None = None,
                  file_name: str = "scorecard_bins.svg") -> dict[str, str]:
        """SVG form of the reference's per-bin diagnostic
        (scorecard.py:229-258): panel 'score' is the per-bin score
        line, panel 'rates' carries hit_rate (share of rows in the bin)
        and pos_rate (bad- or good-rate per self.bad_flag) — two panels
        instead of the reference's twin-axis figure (documented
        divergence; saved as <stem>_score.svg / <stem>_rates.svg)."""
        from ..functions import svgplot as sp

        if self.binning_df is None:
            raise RuntimeError("fit() before plot_bins()")
        b = self.binning_df
        idx = list(range(len(b)))
        hit_rate = (b["hits"] / max(float(b["hits"].sum()), 1.0)).tolist()
        denom = b["hits"].replace(0, 1).astype(float)
        pos = b["bad_hits"] if self.bad_flag else b["good_hits"]
        pos_rate = (pos / denom).tolist()
        out = {
            "score": sp.line_chart(
                [{"name": "score", "x": idx, "y": b["score"].tolist()}],
                title="Score by bin", xlabel="bin", ylabel="score",
                legend=False,
            ),
            "rates": sp.line_chart(
                [
                    {"name": "hit_rate", "x": idx, "y": hit_rate},
                    {"name": "pos_rate", "x": idx, "y": pos_rate},
                ],
                title="Hit/positive rate by bin", xlabel="bin",
                ylabel="rate", ylim=(0.0, 1.0),
            ),
        }
        if out_path:
            stem = file_name.rsplit(".", 1)[0]
            for key, svg in out.items():
                sp.save(svg, out_path, f"{stem}_{key}.svg")
        return out
