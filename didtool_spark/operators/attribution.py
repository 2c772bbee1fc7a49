"""Multi-touch attribution over per-key event streams.

"Which touchpoints get credit for this conversion?" — the classic
marketing/behavior analytics primitive, and on transcripts the same
machinery scores which tool calls preceded a successful outcome.

Two stages, both windowed (no joins, no per-row Python):

1. assignment: every touch row finds the FIRST conversion strictly
   after it within ``lookback_s`` — the labels.with_time_to_event
   conditional-min rangeBetween frame, one shuffle on ``keys``;
2. crediting: touches grouped by their (keys, conversion ts) get a
   position via row_number over the journey window and a credit from
   the chosen model:

   - ``last_touch`` / ``first_touch``: all credit to the latest /
     earliest touch;
   - ``linear``: 1/n each;
   - ``position_based`` (U-shape): 40% first, 40% last, the middle
     20% split evenly (n=1 -> 1.0, n=2 -> 0.5/0.5).

Credits per conversion journey always sum to exactly 1, every model
(property-tested).  Unassigned touches (no conversion within the
lookback) come back with NULL conv_ts and credit 0 — keep them: the
untouched-path rate is itself a feature.

Hot-key note: both windows partition by ``keys`` (+ conv bucket in
stage 2); a single conversation's journey is bounded by the lookback,
and the stage-1 window decomposes exactly like with_time_to_event's
``strategy="bucketed"`` if a key's total history is the problem.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .temporal import epoch_seconds

__all__ = ["attribute_touches"]

MODELS = ("last_touch", "first_touch", "linear", "position_based")


def attribute_touches(
    df: DataFrame,
    touch: Column,
    conversion: Column,
    keys: Sequence[str] | str = "user_id",
    ts_col: str = "ts",
    order: Sequence[str] | str = ("ts", "event_id"),
    lookback_s: int = 604800,
    model: str = "linear",
) -> DataFrame:
    """Touch rows + ``conv_ts_s`` (epoch seconds of the attributed
    conversion; NULL if none within the lookback), ``n_touches``,
    ``position`` (1 = earliest touch of the journey) and ``credit``.
    """
    if model not in MODELS:
        raise ValueError(f"model must be one of {MODELS}, got {model!r}")
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    order_l = [order] if isinstance(order, str) else list(order)

    base = df.withColumn("__ep", epoch_seconds(ts_col))
    wconv = (
        Window.partitionBy(*keys_l)
        .orderBy("__ep")
        .rangeBetween(1, int(lookback_s))
    )
    assigned = base.withColumn(
        "__conv_ep", F.min(F.when(conversion, F.col("__ep"))).over(wconv)
    ).where(touch)

    wj = Window.partitionBy(*keys_l, "__conv_ep").orderBy(*order_l)
    wjall = Window.partitionBy(*keys_l, "__conv_ep")
    j = (
        assigned.withColumn("__pos", F.row_number().over(wj))
        .withColumn("__n", F.count(F.lit(1)).over(wjall))
    )

    n, pos = F.col("__n"), F.col("__pos")
    if model == "last_touch":
        credit = F.when(pos == n, 1.0).otherwise(0.0)
    elif model == "first_touch":
        credit = F.when(pos == 1, 1.0).otherwise(0.0)
    elif model == "linear":
        credit = F.lit(1.0) / n
    else:  # position_based U-shape
        credit = (
            F.when(n == 1, 1.0)
            .when(n == 2, 0.5)
            .when(pos == 1, 0.4)
            .when(pos == n, 0.4)
            .otherwise(F.lit(0.2) / (n - 2))
        )
    credit = F.when(F.col("__conv_ep").isNotNull(), credit).otherwise(0.0)
    return (
        j.withColumn("conv_ts_s", F.col("__conv_ep").cast("double"))
        .withColumn(
            "n_touches",
            F.when(F.col("__conv_ep").isNotNull(), n).cast("long"),
        )
        .withColumn(
            "position",
            F.when(F.col("__conv_ep").isNotNull(), pos).cast("long"),
        )
        .withColumn("credit", credit)
        .drop("__ep", "__conv_ep", "__pos", "__n")
    )
