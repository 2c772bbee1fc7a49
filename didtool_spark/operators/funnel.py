"""Ordered-step funnel analysis over per-key event streams.

The transcript/product question "did the conversation reach tool-call
-> tool-result -> resolution, and when?" is a funnel: k named step
predicates that must complete in order, each on a strictly later row
than the one that completed the previous step.

Scale design: ONE hash exchange on the keys and ONE sort — every
step's "earliest completion so far" is a running conditional min over
the same window spec, and step i's qualifier references step i-1's
running value on STRICTLY EARLIER rows (an unbounded-preceding..-1
frame), so Catalyst plans the whole cascade as a single Window
operator chain on one sort (asserted in tests/test_funnel.py).  The
per-key rollup rides the same partitioning.  Semantics note: each
step greedily takes its EARLIEST in-order completion, which is exact
for existence/depth (taking an earlier completion never prevents a
later step); when ``horizon_s`` is set, the window is anchored at the
earliest first-step completion — the standard product-analytics
simplification, documented rather than hidden (a "any anchor within
horizon" variant would need per-anchor re-scans).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .temporal import epoch_seconds

__all__ = ["funnel"]


def funnel(
    df: DataFrame,
    steps: Sequence[tuple[str, Column]],
    keys: Sequence[str] | str = "conv_id",
    order: Sequence[str] | str = ("ts", "turn_idx"),
    ts_col: str = "ts",
    horizon_s: int | None = None,
) -> DataFrame:
    """One row per key: ``(keys..., {name}_ts ... per step, depth)``.

    steps: ordered (name, predicate Column) pairs.  ``{name}_ts`` is
    the timestamp of the step's earliest in-order completion (NULL if
    the funnel never reached it); ``depth`` counts completed steps.
    A single row satisfies at most ONE step — the next step must
    complete on a strictly later row, so "searched then resolved"
    never fires on one event that happens to match both predicates.
    ``horizon_s`` additionally requires steps 2..k to complete within
    that many seconds of the step-1 completion (anchored at the
    earliest step-1 row — see module docstring).
    """
    steps_l = [(n, p) for n, p in steps]
    if not steps_l:
        raise ValueError("steps must be non-empty")
    names = [n for n, _ in steps_l]
    if len(set(names)) != len(names):
        raise ValueError("step names must be unique")
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    order_l = [order] if isinstance(order, str) else list(order)

    base = df.withColumn("__ts_long", epoch_seconds(ts_col))
    w_cur = (
        Window.partitionBy(*keys_l).orderBy(*order_l)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_prev = (
        Window.partitionBy(*keys_l).orderBy(*order_l)
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    out = base
    prev_run_prev: Column | None = None
    for i, (name, pred) in enumerate(steps_l):
        cond = pred
        if i > 0:
            # previous step completed on a strictly earlier row
            cond = cond & prev_run_prev.isNotNull()
            if horizon_s is not None:
                # within horizon of the earliest step-1 completion on
                # strictly earlier rows
                cond = cond & (
                    F.col("__ts_long")
                    <= F.col(f"__run_{names[0]}_prev") + F.lit(int(horizon_s))
                )
        run = F.min(F.when(cond, F.col("__ts_long"))).over(w_cur)
        run_prev = F.min(F.when(cond, F.col("__ts_long"))).over(w_prev)
        out = out.withColumn(f"__run_{name}", run).withColumn(
            f"__run_{name}_prev", run_prev
        ).withColumn(
            # the RAW completion timestamp (conditions gate on whole
            # seconds, but the emitted {name}_ts keeps sub-second
            # precision — raw ts ordering refines the truncated
            # ordering, so this is the same earliest completion row)
            f"__runts_{name}", F.when(cond, F.col(ts_col))
        )
        prev_run_prev = F.col(f"__run_{name}_prev")

    aggs = []
    for name in names:
        aggs.append(F.min(f"__runts_{name}").alias(f"{name}_ts"))
    res = out.groupBy(*keys_l).agg(*aggs)
    # steps are monotone (step i needs i-1), so counting non-null
    # completion timestamps gives the funnel depth directly
    depth: Column = sum(
        (F.col(f"{n}_ts").isNotNull().cast("int") for n in names),
        F.lit(0),
    )
    return res.withColumn("depth", depth.cast("int"))
