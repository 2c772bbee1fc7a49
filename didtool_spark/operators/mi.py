"""Mutual-information feature scoring and quantile (rank) transforms.

Reference parity: didtool ranks features by IV (stats.py iv_*) — the
credit-risk metric.  General training pipelines rank by MUTUAL
INFORMATION (works for any discrete target, not just binary good/bad)
and normalize skewed numerics with a QUANTILE TRANSFORM (the sklearn
QuantileTransformer didtool's pipelines used around it).  Both follow
the same engine patterns as iv_all / binning.

Scale design:
- ``mi_scores``: every feature melts into one (feature, value, y)
  stream -> ONE map-side-combined groupBy for the joint counts; the
  marginals reduce over that aggregated table (never the input), and
  the MI sum is a per-feature aggregation of cell terms.  One scan,
  one input-sized shuffle, whatever the column count.
- ``quantile_transform``: a global percent-rank is a global sort — the
  scale-wrong plan.  Instead FIT a B-edge quantile grid per column
  (one melted exact/approx percentile agg, O(B x columns) state), then
  APPLY by binary-searching the literal grid and linearly
  interpolating inside the bin — pure codegen, rank error bounded by
  1/B.  ``output="normal"`` maps the uniform rank through the Acklam
  inverse-normal-CDF rational approximation (|err| < 1.15e-9, far
  inside the engine's 1e-6 gate rounding) — closed-form expressions
  only, so the oracle can replay it verbatim.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mi_scores", "quantile_transform", "probit_expr"]


def mi_scores(
    df: DataFrame,
    cols: Sequence[str] | str,
    target: str = "y",
) -> DataFrame:
    """Mutual information I(X; Y) in nats per (discrete) feature:
    ``(feature, mi)``.

    Rows with a NULL target drop; a NULL feature VALUE is a level (the
    didtool convention).  Bin/discretize continuous columns first (the
    binning operators) — MI of a near-unique column is a cardinality
    artifact, not signal.
    """
    cols_l = [cols] if isinstance(cols, str) else list(cols)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("__feat"),
                F.col(c).cast("string").alias("__val"),
            )
            for c in cols_l
        ]
    )
    m = (
        df.where(F.col(target).isNotNull())
        .select(F.col(target).cast("string").alias("__y"), F.explode(pairs).alias("__p"))
        .select("__y", F.col("__p.__feat").alias("__feat"), F.col("__p.__val").alias("__val"))
    )
    joint = m.groupBy("__feat", "__val", "__y").agg(F.count(F.lit(1)).alias("__nxy"))
    # marginals + total reduce over the aggregated cell table
    from pyspark.sql import Window

    wf = Window.partitionBy("__feat")
    wx = Window.partitionBy("__feat", "__val")
    wy = Window.partitionBy("__feat", "__y")
    cells = (
        joint.withColumn("__n", F.sum("__nxy").over(wf))
        .withColumn("__nx", F.sum("__nxy").over(wx))
        .withColumn("__ny", F.sum("__nxy").over(wy))
    )
    term = (F.col("__nxy") / F.col("__n")) * F.log(
        (F.col("__nxy").cast("double") * F.col("__n")) / (F.col("__nx") * F.col("__ny"))
    )
    return (
        cells.groupBy(F.col("__feat").alias("feature"))
        .agg(F.sum(term).alias("mi"))
    )


# Acklam's rational approximation to the inverse normal CDF.
# Coefficients are the published constants; |error| < 1.15e-9 over
# (0, 1), which the 1e-6 gate rounding cannot see.
_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)
_P_LOW = 0.02425


def _poly(coefs, x: Column) -> Column:
    out = F.lit(coefs[0])
    for c in coefs[1:]:
        out = out * x + F.lit(c)
    return out


def probit_expr(p: Column) -> Column:
    """Inverse normal CDF as a pure expression (Acklam).  NULL outside
    (0, 1)."""
    q_low = F.sqrt(-2.0 * F.log(p))
    low = _poly(_C, q_low) / (_poly(_D, q_low) * q_low + 1.0)
    q_high = F.sqrt(-2.0 * F.log(1.0 - p))
    high = -(_poly(_C, q_high) / (_poly(_D, q_high) * q_high + 1.0))
    r = p - 0.5
    s = r * r
    mid = _poly(_A, s) * r / (_poly(_B, s) * s + 1.0)
    return (
        F.when((p > 0) & (p < F.lit(_P_LOW)), low)
        .when((p >= F.lit(_P_LOW)) & (p <= F.lit(1 - _P_LOW)), mid)
        .when((p > F.lit(1 - _P_LOW)) & (p < 1), high)
    )


def probit_sql(p: str) -> str:
    """The same Acklam approximation as ``probit_expr``, emitted as
    ANSI SQL text over expression ``p`` — single-sourced coefficients
    so a DuckDB oracle replays the engine's exact arithmetic."""
    # one DOUBLE cast up front: DuckDB types bare decimal literals as
    # DECIMAL, and the polynomial chain overflows DECIMAL scale
    p = f"CAST(({p}) AS DOUBLE)"

    def poly(coefs, x):
        out = repr(coefs[0])
        for c in coefs[1:]:
            out = f"(({out}) * ({x}) + {c!r})"
        return out

    ql = f"sqrt(-2.0 * ln({p}))"
    low = f"(({poly(_C, ql)}) / (({poly(_D, ql)}) * ({ql}) + 1.0))"
    qh = f"sqrt(-2.0 * ln(1.0 - ({p})))"
    high = f"(-(({poly(_C, qh)}) / (({poly(_D, qh)}) * ({qh}) + 1.0)))"
    r = f"(({p}) - 0.5)"
    s = f"({r} * {r})"
    mid = f"(({poly(_A, s)}) * {r} / (({poly(_B, s)}) * {s} + 1.0))"
    return (
        f"CASE WHEN ({p}) > 0 AND ({p}) < {_P_LOW!r} THEN {low} "
        f"WHEN ({p}) >= {_P_LOW!r} AND ({p}) <= {1 - _P_LOW!r} THEN {mid} "
        f"WHEN ({p}) > {1 - _P_LOW!r} AND ({p}) < 1 THEN {high} END"
    )


def quantile_transform(
    df: DataFrame,
    cols: Sequence[str] | str,
    n_quantiles: int = 100,
    output: str = "uniform",
    suffix: str = "_q",
    approx: bool = False,
) -> DataFrame:
    """Map each column through its fitted empirical CDF:
    ``{col}{suffix}`` in [0, 1] (``output="uniform"``) or its probit
    (``output="normal"``, clipped to the grid's open interval).

    Fit: ONE melted percentile aggregation produces a B-edge grid per
    column; apply: binary-search the LITERAL grid + linear
    interpolation — pure codegen, no sort, no shuffle, rank error
    <= 1/B.  NULLs pass through as NULL; a constant column maps to
    0.5.
    """
    if output not in ("uniform", "normal"):
        raise ValueError(f"unknown output {output!r}")
    cols_l = [cols] if isinstance(cols, str) else list(cols)
    B = int(n_quantiles)
    probs = [i / B for i in range(B + 1)]
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("__feat"), F.col(c).cast("double").alias("__val"))
            for c in cols_l
        ]
    )
    m = df.select(F.explode(pairs).alias("__p")).select(
        F.col("__p.__feat").alias("__feat"), F.col("__p.__val").alias("__val")
    )
    pct = F.approx_percentile if approx else F.percentile
    grid = {
        r["feature"]: r["edges"]
        for r in m.groupBy(F.col("__feat").alias("feature"))
        .agg(pct(F.col("__val"), F.array(*[F.lit(p) for p in probs])).alias("edges"))
        .collect()
    }
    out = df
    for c in cols_l:
        edges = grid[c]
        x = F.col(c).cast("double")
        if edges is None or edges[0] is None:  # all-NULL column
            out = out.withColumn(f"{c}{suffix}", F.lit(None).cast("double"))
            continue
        if float(edges[0]) == float(edges[-1]):  # constant column
            mapped = 0.5 if output == "uniform" else 0.0
            out = out.withColumn(
                f"{c}{suffix}", F.when(x.isNotNull(), F.lit(mapped))
            )
            continue
        # piecewise-linear CDF over the literal grid: one F.aggregate
        # fold over a LITERAL segment array (each bin adds
        # (x - lo)/(hi - lo)/B clamped; zero-width tie bins add a step).
        # A fold, not an unrolled B-term expression tree: unrolling at
        # B=20 already blows janino's method-size limit and drops the
        # whole projection out of whole-stage codegen.
        segs = F.array(
            *[
                F.struct(
                    F.lit(float(edges[i])).alias("lo"),
                    F.lit(float(edges[i + 1])).alias("hi"),
                )
                for i in range(B)
            ]
        )
        inv_b = F.lit(1.0 / B)

        def seg_term(acc, s):
            width = s["hi"] - s["lo"]
            interp = F.least(
                F.greatest((x - s["lo"]) / width, F.lit(0.0)), F.lit(1.0)
            )
            step = F.when(x >= s["lo"], F.lit(1.0)).otherwise(F.lit(0.0))
            return acc + F.when(width > 0, interp).otherwise(step) * inv_b

        raw = F.aggregate(segs, F.lit(0.0), seg_term)

        # let-binding via a single-element transform: downstream
        # expressions reference the fold ONCE per row through the
        # lambda variable.  Without it, the probit's CASE branches
        # inline ~8 copies of the B-step fold — and HOFs are not
        # whole-stage-codegen'd, so every copy is interpreted work
        # (measured 12.4s -> ~1s at sf0.1).
        def let(col, fn):
            return F.transform(F.array(col), fn)[0]

        if output == "normal":
            eps = 1.0 / (2.0 * B)

            def finish(t):
                rank = F.when(
                    x.isNotNull(), F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0))
                )
                # when-guard: Spark's greatest/least ignore NULLs, so
                # an unguarded clip would map NULL ranks to probit(eps)
                clipped = F.when(
                    rank.isNotNull(),
                    F.least(F.greatest(rank, F.lit(eps)), F.lit(1.0 - eps)),
                )
                return let(clipped, probit_expr)

            out = out.withColumn(f"{c}{suffix}", let(raw, finish))
        else:
            rank = let(
                raw,
                lambda t: F.when(
                    x.isNotNull(), F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0))
                ),
            )
            out = out.withColumn(f"{c}{suffix}", rank)
    return out
