"""Sequence-structure features over per-entity ordered streams:
Markov transition counts and turn-to-turn token novelty.

Reference parity: didtool's feature matrix is order-free (transform.py
operates on a flat X); transcript/event streams carry signal in the
ORDER of turns — which state follows which, and how much a turn repeats
the previous one.  Both operators below are standard sequence features
computed point-in-time safe (each row only ever sees strictly earlier
rows of its own key).

Scale design:
- ``transition_counts``: one window lag + one map-side-combined groupBy
  whose key space is (entity x V^2) AGGREGATED rows, not events; the
  lag shares the (keys, order) Exchange+Sort with any other feature on
  the same ordering.
- ``with_turn_novelty``: tokenization, lag, and the Jaccard are all
  array expressions inside whole-stage codegen — per-row state is two
  token arrays (turn-sized).  No Python, no extra shuffle beyond the
  shared (keys, order) sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["transition_counts", "with_turn_novelty"]


def _lists(x: Sequence[str] | str) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def transition_counts(
    df: DataFrame,
    col: str,
    keys: Sequence[str] | str = "conv_id",
    order: Sequence[str] | str = ("ts", "turn_idx"),
    per_key: bool = True,
) -> DataFrame:
    """Counts of (previous value -> current value) transitions of
    ``col`` along each key's order: ``(keys..., from, to, n)``
    (``per_key=False`` drops the keys for corpus-level counts).

    The first row of a key starts no transition (excluded by row
    number, NOT by ``prev IS NULL`` — a NULL *value* is a real level
    and transitions like any other).
    """
    keys_l, order_l = _lists(keys), _lists(order)
    w = Window.partitionBy(*keys_l).orderBy(*order_l)
    pairs = (
        df.withColumn("__prev", F.lag(col, 1).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
    )
    grp = [*keys_l] if per_key else []
    return (
        pairs.groupBy(
            *grp, F.col("__prev").alias("from"), F.col(col).alias("to")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def with_turn_novelty(
    df: DataFrame,
    text_col: str,
    keys: Sequence[str] | str = "conv_id",
    order: Sequence[str] | str = ("ts", "turn_idx"),
    token_pattern: str = "[^a-z0-9]+",
) -> DataFrame:
    """Jaccard similarity of the row's distinct lowercase tokens vs the
    PREVIOUS row of its key: column ``{text_col}_jaccard_prev`` in
    [0, 1]; NULL on each key's first row and when both token sets are
    empty.  1.0 = the turn repeats the previous one exactly (a loop /
    stall signal — the inverse of novelty).

    NULL or empty text tokenizes to the empty set (so a NULL turn after
    a non-empty one scores 0.0, not NULL — the turn IS fully novel).
    """
    keys_l, order_l = _lists(keys), _lists(order)
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), token_pattern),
            lambda t: t != "",
        )
    )
    toks = F.coalesce(toks, F.array().cast("array<string>"))
    w = Window.partitionBy(*keys_l).orderBy(*order_l)
    out = (
        df.withColumn("__toks", toks)
        .withColumn("__prev", F.lag("__toks", 1).over(w))
    )
    inter = F.size(F.array_intersect(F.col("__toks"), F.col("__prev")))
    union = F.size(F.array_union(F.col("__toks"), F.col("__prev")))
    jac = F.when(
        F.col("__prev").isNotNull() & (union > 0),
        inter.cast("double") / union.cast("double"),
    )
    return out.withColumn(f"{text_col}_jaccard_prev", jac).drop(
        "__toks", "__prev"
    )
