"""Linear dimensionality reduction over embedding columns: exact PCA
and Johnson-Lindenstrauss random projection.

Fit (PCA) is the classic distributed moment reduction: every
partition's Arrow batches fold into ONE (count, sum, X'X Gram)
partial — dim + dim^2 floats per partition, never per row — summed on
the driver, where the dim x dim eigendecomposition runs (dim is tens
to low thousands; the 10^12-row axis never leaves the cluster, the
dim^2 axis never enters it).  Eigenvectors are sign-normalized (the
largest-|entry| coordinate is made positive) so the fit is
deterministic up to eigenvalue ties.

Transform (both PCA and random projection) is a pure column
expression: pc_j = aggregate(zip_with(v, w_j, (x, w) -> x * w)) -
offset_j, with the projection matrix inlined as array literals —
JVM-side, no Python in the row path, broadcast-free (the matrix rides
in the plan).  This mirrors the LSH plane-literal design
(similarity.py); like the IVF split, the iterative/eigen fit is
unit-tested (vs numpy) while the projection mechanics are
driver-gate-checked with a FIXED seeded matrix the DuckDB oracle
replays from the same literals (plans/pipeline_queries.q_random_projection).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PCAModel", "pca_fit", "pca_project", "random_project", "gate_projection_matrix"]


@dataclass
class PCAModel:
    mean: list[float]
    components: list[list[float]]  # k rows of dim floats
    explained_variance: list[float]
    explained_variance_ratio: list[float]


def pca_fit(df: DataFrame, col: str, k: int) -> PCAModel:
    """Exact population PCA of ``col`` (array<float/double>), top-``k``
    components.  One pass: per-partition (n, sum, Gram) partials via
    mapInPandas, reduced on the driver; cov = Gram/n - mean mean'."""
    import numpy as np
    import pandas as pd

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            try:
                x = np.stack(pdf[col].to_numpy())
            except ValueError as e:  # ragged lengths -> clear message
                lens = sorted({len(v) for v in pdf[col]})
                raise ValueError(
                    f"pca_fit: embedding lengths are ragged ({lens}); "
                    "all vectors must share one dimension"
                ) from e
            x = x.astype(np.float64)
            if np.isnan(x).any():
                # Arrow maps a NULL array element to NaN at the
                # pandas boundary, so NULL-element and NaN-element
                # vectors are indistinguishable here — and both
                # poison every moment (the NaNs then round-trip back
                # through Arrow as nulls and used to surface as an
                # opaque driver-side TypeError in the partial
                # reduction; ADVICE r4).  One vectorized isnan pass
                # per batch, negligible next to the Gram matmul.
                raise ValueError(
                    f"pca_fit: {col!r} contains vectors with NULL or "
                    "NaN elements; filter them first, e.g. "
                    f".where(~exists({col}, x -> x IS NULL OR "
                    "isnan(x)))"
                )
            n += x.shape[0]
            s = x.sum(0) if s is None else s + x.sum(0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    # NULL embeddings carry no information for the moments — drop them
    # BEFORE the Arrow boundary (np.stack would die opaquely on None)
    parts = (
        df.select(F.col(col).cast("array<double>").alias(col))
        .where(F.col(col).isNotNull())
        .mapInPandas(partials, "n long, s array<double>, g array<double>")
        .collect()
    )
    if not parts:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    dim = s.shape[0]
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in parts], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps, evs = [], []
    for i in order:
        v = vecs[:, i]
        # deterministic sign: the largest-|entry| coordinate positive
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
        evs.append(float(max(vals[i], 0.0)))
    total = float(max(np.trace(cov), 1e-300))
    return PCAModel(
        mean=[float(x) for x in mean],
        components=comps,
        explained_variance=evs,
        explained_variance_ratio=[e / total for e in evs],
    )


def _dot_lit(vec: Column, weights: Sequence[float]) -> Column:
    w = F.array(*[F.lit(float(x)) for x in weights])
    return F.aggregate(
        F.zip_with(vec, w, lambda x, ww: x.cast("double") * ww),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_project(
    df: DataFrame,
    col: str,
    model: PCAModel,
    prefix: str = "pc",
) -> DataFrame:
    """Adds ``{prefix}0..{prefix}{k-1}`` = components @ (v - mean),
    with the mean folded into per-component literal offsets so the row
    expression is a single weighted fold per component."""
    out = df
    for j, comp in enumerate(model.components):
        offset = float(sum(c * m for c, m in zip(comp, model.mean)))
        out = out.withColumn(
            f"{prefix}{j}", _dot_lit(F.col(col), comp) - F.lit(offset)
        )
    return out


def random_project(
    df: DataFrame,
    col: str,
    matrix: Sequence[Sequence[float]],
    prefix: str = "rp",
    scale: float | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss projection onto ``matrix`` rows (k x dim):
    distance-preserving dimensionality reduction with NO fit pass at
    all — the right trade at 100 TB when a full PCA sweep is not worth
    its scan.  ``scale`` defaults to 1/sqrt(k) (the JL normalization)."""
    import math

    k = len(matrix)
    sc = float(scale) if scale is not None else 1.0 / math.sqrt(k)
    out = df
    for j, row in enumerate(matrix):
        out = out.withColumn(
            f"{prefix}{j}", _dot_lit(F.col(col), row) * F.lit(sc)
        )
    return out


def gate_projection_matrix(k: int = 4, dim: int = 64) -> list[list[float]]:
    """Fixed seeded JL matrix for the driver gate — numpy's legacy
    RandomState stream is stability-guaranteed, so the query and the
    DuckDB oracle inline identical literals (the IVF gate-centroid
    pattern, pipeline_queries.py:315)."""
    import numpy as np

    rs = np.random.RandomState(23)
    return [[float(v) for v in row] for row in rs.standard_normal((k, dim))]
