"""Fixed-grid time resampling: align per-entity event streams onto a
regular time grid with per-bucket aggregation and forward-fill.

Reference parity: didtool assumes an already-regular feature matrix;
building one from irregular transcript/event streams is the pandas
``df.resample('1min').last().ffill()`` step — this is that operator,
distributed and point-in-time safe (a grid cell only ever sees events
inside or before its own bucket).

Scale design:
- per-(key, bucket) aggregation first: ONE map-side-combined groupBy —
  the shuffle carries aggregated cells, never raw events.
- the dense grid materializes per KEY via ``sequence() + explode`` over
  the key's [min_bucket, max_bucket] span — generated distributedly
  next to the data (no driver loop, no cross join); a key's grid size
  is span/step, so pick ``step_s`` accordingly (documented, the same
  contract pandas resample has).
- forward-fill is ``last(ignorenulls)`` over one (key, bucket) sort —
  the temporal.py ffill pattern; occupied-cell joins stay on the same
  partitioning.
- "last value in bucket" uses the deterministic max-of-struct
  (ts, value) tie-break — the heavy_hitters/profile pattern, exactly
  replayable in SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_grid"]

_AGGS = ("last", "sum", "avg", "count", "max", "min")


def resample_grid(
    df: DataFrame,
    value_col: str,
    step_s: int,
    keys: Sequence[str] | str = "conv_id",
    ts_col: str = "ts",
    agg: str = "last",
    ffill: bool = False,
) -> DataFrame:
    """One row per (key, grid bucket) from each key's first to last
    event: ``(keys..., bucket_ts, {value_col}_{agg} [, n_events])``.

    ``agg="last"`` takes the bucket's latest value (ties on the exact
    same timestamp break toward the larger value — deterministic);
    empty buckets are NULL (or forward-filled from the previous
    occupied bucket when ``ffill=True`` — never backward, so the grid
    stays leakage-free).  ``n_events`` counts the bucket's rows (0 for
    gap cells).
    """
    if agg not in _AGGS:
        raise ValueError(f"unsupported agg {agg!r}; pick from {_AGGS}")
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    out_col = f"{value_col}_{agg}"
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    step_us = int(step_s) * 1_000_000
    b = df.withColumn("__b", F.floor(us / F.lit(step_us))).withColumn("__us", us)
    v = F.col(value_col).cast("double")
    if agg == "last":
        cell = F.max(
            F.when(v.isNotNull(), F.struct(F.col("__us").alias("u"), v.alias("v")))
        )["v"]
    elif agg == "count":
        cell = F.count(v).cast("long")
    else:
        cell = getattr(F, agg)(v)
    cells = b.groupBy(*keys_l, "__b").agg(
        cell.alias("__v"), F.count(F.lit(1)).alias("__n")
    )
    # dense per-key grid, generated next to the data
    span = cells.groupBy(*keys_l).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = span.select(
        *keys_l, F.explode(F.sequence("__lo", "__hi")).alias("__b")
    )
    j = grid.join(cells, [*keys_l, "__b"], "left")
    val = F.col("__v")
    if ffill:
        w = (
            Window.partitionBy(*keys_l)
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        val = F.last("__v", ignorenulls=True).over(w)
    return j.select(
        *keys_l,
        F.timestamp_micros(F.col("__b") * F.lit(step_us)).alias("bucket_ts"),
        val.alias(out_col),
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_events"),
    )
