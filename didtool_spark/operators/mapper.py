"""FeatureMapper — the encode stage of the reference's model pipeline
(LGBModelSingle.__init__ at model.py:112-131: per-feature
WOEEncoder / label-encode / passthrough ColumnTransformer), with the
fit-on-train-only leakage discipline (model.py:167-171: mapper fitted on
group==0 rows, applied to all).

Model *training* is out of engine scope (SURVEY.md §2.7); scoring an
exported booster distributively = broadcast it into a pandas_udf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .woe import LabelEncoder, WOEEncoder


class FeatureMapper:
    """spec: {feature: 'woe' | 'label' | 'passthrough'}."""

    def __init__(self, spec: dict[str, str]):
        self.spec = dict(spec)
        self.encoders: dict[str, object] = {}

    def fit(self, df: DataFrame, target: str, group_col: str | None = "group"):
        """Fit every encoder on the training subset only (group==0 when
        ``group_col`` exists — the zero-leakage contract)."""
        train = df.where(F.col(group_col) == 0) if group_col and group_col in df.columns else df
        for feat, kind in self.spec.items():
            if kind == "woe":
                self.encoders[feat] = WOEEncoder().fit(train, feat, target)
            elif kind == "label":
                self.encoders[feat] = LabelEncoder().fit(train, feat)
            elif kind == "passthrough":
                self.encoders[feat] = None
            else:
                raise ValueError(f"unknown encoder kind {kind!r} for {feat}")
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        cols = []
        for c in df.columns:
            enc = self.encoders.get(c)
            if enc is None:
                cols.append(F.col(c))
            else:
                cols.append(enc.expr(c).alias(c))
        return df.select(*cols)
