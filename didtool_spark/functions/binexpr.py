"""Edge-list -> bin-id column expression codegen.

Single shared helper so every binning operator gets identical edge
semantics (reference pd.cut: right-closed (a, b] intervals, NaN/null ->
nan_value, out-of-range -> nan_value when outer edges are finite;
cf. reference cut.py:410-433 cut_with_bins).

The generated expression is a sum of JVM-side comparisons — fully
inside whole-stage codegen, no UDF, no shuffle.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, functions as F

# interior-edge count above which the comparison-sum codegen form is
# swapped for a flat array+filter (see bin_expr)
MAX_CODEGEN_EDGES = 128


def bin_expr(
    col: Column | str,
    edges: Sequence[float],
    nan_value: int = -1,
    right: bool = True,
) -> Column:
    """Bin id for ``col`` given sorted ``edges`` (len >= 2, may start/end
    with ±inf). right=True: bin i = (edges[i], edges[i+1]]."""
    c = F.col(col) if isinstance(col, str) else col
    edges = [float(e) for e in edges]
    interior = edges[1:-1]

    def gt(e: float) -> Column:  # does x fall strictly right of edge e?
        return (c > F.lit(e)) if right else (c >= F.lit(e))

    if not interior:
        bin_id = F.lit(0)
    elif len(interior) <= MAX_CODEGEN_EDGES:
        bin_id = sum((gt(e).cast("int") for e in interior), F.lit(0))
    else:
        # a left-nested Add chain deeper than a few hundred edges blows
        # the JVM analyzer stack; above the threshold count the edges
        # below x over a flat literal array instead (breadth, not depth;
        # interpreted HOF — only the micro-bin fit path ever gets here,
        # a transform never has thousands of edges)
        arr = F.array(*[F.lit(e) for e in interior])
        cmp = (lambda e: c > e) if right else (lambda e: c >= e)
        bin_id = F.size(F.filter(arr, cmp))

    # NULL and float-NaN both map to the nan bucket (reference treats
    # np.nan as the single missing marker)
    is_missing = c.isNull() | F.isnan(c.cast("double"))

    out_of_range = F.lit(False)
    if math.isfinite(edges[0]):
        out_of_range = out_of_range | (~gt(edges[0]))
    if math.isfinite(edges[-1]):
        oob_hi = (c > F.lit(edges[-1])) if right else (c >= F.lit(edges[-1]))
        out_of_range = out_of_range | oob_hi

    return (
        F.when(is_missing | out_of_range, F.lit(int(nan_value)))
        .otherwise(bin_id)
        .cast("int")
    )
