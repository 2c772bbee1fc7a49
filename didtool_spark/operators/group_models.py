"""Per-group (segmented) model fitting: one independent logistic
regression per segment, fit in parallel across the cluster.

Reference parity: didtool fits ONE global model (model.py GBMModel*);
production scoring pipelines routinely need a model PER SEGMENT
(per-country calibration, per-tool success model, per-event-type
propensity).  Fitting thousands of small models is a grouped-map
problem, not a big-model problem — exactly what ``applyInPandas`` is
for: each group's rows arrive as one pandas frame, a deterministic
full-batch numpy GD fits in milliseconds, and only (weights, bias) per
group comes back.

Scale design:
- fit: ONE shuffle on the group key; kernel state is O(n_features).
  Group size bounds task size — segments are the natural "many small
  tasks" shape (a segment too big to fit in a task should graduate to
  the global distributed GD in operators/classifier.py).
- apply: the models table is tiny (groups x features) — broadcast join
  + a pure-codegen dot product/sigmoid; scoring never leaves the JVM.
- determinism: rows are sorted inside the kernel before the math and
  the GD is full-batch from zero init, so the fit is a pure function
  of the group's row SET — bit-identical across partitionings, and
  bit-identical to the pure-python twin (``fit_logistic_arrays``) the
  SQL oracle's literal replay is built from.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fit_logistic_arrays",
    "fit_logistic_per_group",
    "apply_group_models",
]


def fit_logistic_arrays(X, y, n_iter: int = 200, lr: float = 0.5,
                        l2: float = 1e-4):
    """Deterministic full-batch logistic GD on numpy arrays; the pure
    twin of the per-group kernel.  Features are standardized for the
    descent and the scaling is folded back, so the returned
    ``(weights, bias)`` apply to RAW feature values.  Returns
    ``(weights: list[float], bias: float)``."""
    import numpy as np

    # ascontiguousarray, not asarray: a strided view (e.g. pandas
    # .to_numpy() after a sort) changes BLAS accumulation order, which
    # would break the bit-identity contract with the kernel path
    X = np.ascontiguousarray(X, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    n, d = X.shape
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd = np.where(sd == 0.0, 1.0, sd)
    Xs = (X - mu) / sd
    w = np.zeros(d)
    b = 0.0
    for _ in range(int(n_iter)):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        g = Xs.T @ (p - y) / n + l2 * w
        gb = float((p - y).mean())
        w -= lr * g
        b -= lr * gb
    w_raw = w / sd
    b_raw = b - float((w * mu / sd).sum())
    return [float(v) for v in w_raw], float(b_raw)


def fit_logistic_per_group(
    df: DataFrame,
    features: Sequence[str],
    label_col: str,
    group_cols: Sequence[str] | str = "conv_id",
    order_col: str | None = None,
    n_iter: int = 200,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> DataFrame:
    """Fit one logistic regression per group: returns
    ``(group_cols..., weights array<double>, bias double, n bigint)``.

    Rows with a NULL label or any NULL feature are excluded (they
    belong to no gradient).  ``order_col`` pins the in-kernel sort for
    bit-reproducibility; when omitted the rows sort by their feature
    tuple + label, which is deterministic for any input multiset.
    """
    feats = list(features)
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    cond = F.col(label_col).isNotNull()
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    sel = groups + feats + [label_col] + ([order_col] if order_col else [])
    base = df.where(cond).select(*sel)

    gtypes = dict(base.select(*groups).dtypes)
    schema = ", ".join(
        [f"`{g}` {gtypes[g]}" for g in groups]
        + ["weights array<double>", "bias double", "n bigint"]
    )
    sort_cols = [order_col] if order_col else feats + [label_col]
    n_it, lr_, l2_ = int(n_iter), float(lr), float(l2)

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        X = pdf[feats].to_numpy(dtype="float64")
        y = pdf[label_col].to_numpy(dtype="float64")
        w, b = fit_logistic_arrays(X, y, n_it, lr_, l2_)
        return pd.DataFrame(
            [[*(pdf.iloc[0][g] for g in groups), w, b, len(pdf)]],
            columns=groups + ["weights", "bias", "n"],
        )

    return base.groupBy(*groups).applyInPandas(kernel, schema=schema)


def apply_group_models(
    df: DataFrame,
    models: DataFrame,
    features: Sequence[str],
    group_cols: Sequence[str] | str = "conv_id",
    out_col: str = "score",
    how: str = "left",
) -> DataFrame:
    """Score rows with their group's model: broadcast-joins the tiny
    models table and evaluates ``sigmoid(w . x + b)`` as a pure
    column expression (whole-stage codegen — no Python on the scoring
    path).  Rows whose group has no model get a NULL score under the
    default left join."""
    feats = list(features)
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    # alias the model columns to internal names before joining — a
    # caller column that happens to be named weights/bias/n must
    # neither collide in the join nor be dropped from the output
    m = models.select(
        *groups,
        F.col("weights").alias("__gm_w"),
        F.col("bias").alias("__gm_b"),
    )
    j = df.join(F.broadcast(m), groups, how)
    lin: Column = F.col("__gm_b")
    for i, c in enumerate(feats):
        lin = lin + F.element_at("__gm_w", i + 1) * F.col(c)
    return j.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-lin))
    ).drop("__gm_w", "__gm_b")
