"""Forward-looking (future-window) label construction.

The point-in-time engine's feature side (temporal.py) only ever looks
BACKWARD from each anchor row; supervised training also needs the label
side, which looks strictly FORWARD: "did X happen within the next H
seconds after this turn?".  Keeping the two directions in separate,
single-purpose operators is what makes the zero-temporal-leakage audit
(plans/audit.py) checkable — a feature column can never silently read a
future frame, and a label column always does.

Reference parity: didtool has no label-window operator (its pipelines
assume a precomputed ``target`` column, e.g. transform.py fit(X, y)
signatures); this module supplies the missing forward half that a
point-in-time training-set build over event streams requires.

Scale design: the window strategy is one shuffle on ``keys`` with a
rangeBetween frame on unix seconds (each key = one task — fine for
conversation-sized keys).  ``strategy="bucketed"`` bounds task size by
time bucket instead of key size for hot keys: every row is also emitted
as context into the PREVIOUS bucket (the forward mirror of
with_rolling's time mode), the bucket width is >= the horizon so a
(lower, horizon] forward frame never reaches past the next bucket, and
context rows are dropped after the per-(key, bucket) window runs.
Results are exactly equal to the window strategy; the cost is 2x shuffle
volume on the label payload column only.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .temporal import _AGG, epoch_seconds

__all__ = ["with_future_label", "with_time_to_event"]


def _apply_specs(
    df: DataFrame,
    specs_l: list[tuple[str, str, int]],
    base: Window,
    lower: int,
    fill,
) -> DataFrame:
    out = df
    for col, agg, h in specs_l:
        w = base.rangeBetween(lower, int(h))
        expr: Column = _AGG[agg](col).over(w)
        if fill is not None:
            expr = F.coalesce(expr, F.lit(fill))
        out = out.withColumn(f"{col}_{agg}_next{h}s", expr)
    return out


def with_future_label(
    df: DataFrame,
    specs: Iterable[tuple[str, str, int]],
    keys: Sequence[str] | str = "conv_id",
    ts_col: str = "ts",
    include_current: bool = False,
    fill=None,
    strategy: str = "window",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Attach forward-window label columns.

    specs: (col, agg, horizon_seconds) -> column
    ``{col}_{agg}_next{h}s`` aggregating ``col`` over rows of the same
    ``keys`` whose ``ts_col`` lies in (row_ts, row_ts + h] — strictly
    future by default (``include_current=False``), so the label never
    reads the anchor row itself and the feature/label frames are
    disjoint.  ``fill`` (e.g. 0) replaces the NULL an empty future frame
    produces — the usual binary-label convention "no event in horizon".

    agg: any of sum/avg/min/max/count/stddev.
    """
    lower = 0 if include_current else 1
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    specs_l = [(c, a, int(h)) for c, a, h in specs]
    if not specs_l:
        return df

    if strategy == "window":
        out = df.withColumn("__ts_long", epoch_seconds(ts_col))
        base = Window.partitionBy(*keys_l).orderBy("__ts_long")
        return _apply_specs(out, specs_l, base, lower, fill).drop("__ts_long")

    if strategy != "bucketed":
        raise ValueError(f"unknown with_future_label strategy {strategy!r}")

    # bucketed: forward mirror of with_rolling's time mode — context
    # rows are duplicated into the PREVIOUS bucket so a forward frame of
    # up to max(h) seconds is complete inside every (key, bucket) task.
    bw = max(int(bucket_seconds), max(h for _, _, h in specs_l))
    base_b = df.withColumn("__ts_long", epoch_seconds(ts_col))
    own = base_b.withColumn(
        "__bucket", F.floor(F.col("__ts_long") / F.lit(bw))
    ).withColumn("__ctx", F.lit(False))
    ctx = base_b.withColumn(
        "__bucket", F.floor(F.col("__ts_long") / F.lit(bw)) - 1
    ).withColumn("__ctx", F.lit(True))
    u = own.unionByName(ctx)
    wbase = Window.partitionBy(*keys_l, "__bucket").orderBy("__ts_long")
    u = _apply_specs(u, specs_l, wbase, lower, fill)
    return u.where(~F.col("__ctx")).drop("__ts_long", "__bucket", "__ctx")


def with_time_to_event(
    df: DataFrame,
    event: Column,
    horizon_s: int,
    keys: Sequence[str] | str = "conv_id",
    ts_col: str = "ts",
    name: str = "tte",
    strategy: str = "window",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Survival-style time-to-event labels: for each anchor row, the
    seconds until the FIRST strictly-future row of the same ``keys``
    where ``event`` holds, right-censored at ``horizon_s``.

    Adds ``{name}_s`` (NULL when no qualifying event lies in
    (row_ts, row_ts + horizon] — the censored case) and
    ``{name}_observed`` (the censoring indicator survival losses need;
    a censored row's true time-to-event is only known to exceed the
    horizon, which is information a plain binary future-label throws
    away).  Like ``with_future_label``, the frame is strictly future —
    rows sharing the anchor's exact timestamp are excluded — so this
    is a LABEL column: keep it out of the feature set the zero-leakage
    audit covers.

    Scale design matches with_future_label: one shuffle on ``keys``
    with a conditional-min rangeBetween frame; ``strategy="bucketed"``
    mirrors rows into the PREVIOUS time bucket (width >= horizon) so a
    hot key's task is bounded by bucket, with identical output.
    """
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    h = int(horizon_s)

    def attach(frame: DataFrame, base: Window) -> DataFrame:
        w = base.rangeBetween(1, h)
        first_ev = F.min(
            F.when(event, F.col("__ts_long"))
        ).over(w)
        return frame.withColumn(
            f"{name}_s", (first_ev - F.col("__ts_long")).cast("long")
        ).withColumn(f"{name}_observed", first_ev.isNotNull())

    if strategy == "window":
        out = df.withColumn("__ts_long", epoch_seconds(ts_col))
        base = Window.partitionBy(*keys_l).orderBy("__ts_long")
        return attach(out, base).drop("__ts_long")

    if strategy != "bucketed":
        raise ValueError(f"unknown with_time_to_event strategy {strategy!r}")

    bw = max(int(bucket_seconds), h)
    base_b = df.withColumn("__ts_long", epoch_seconds(ts_col))
    own = base_b.withColumn(
        "__bucket", F.floor(F.col("__ts_long") / F.lit(bw))
    ).withColumn("__ctx", F.lit(False))
    ctx = base_b.withColumn(
        "__bucket", F.floor(F.col("__ts_long") / F.lit(bw)) - 1
    ).withColumn("__ctx", F.lit(True))
    u = own.unionByName(ctx)
    wbase = Window.partitionBy(*keys_l, "__bucket").orderBy("__ts_long")
    u = attach(u, wbase)
    return u.where(~F.col("__ctx")).drop("__ts_long", "__bucket", "__ctx")
