"""Sequence-structure features over per-entity ordered streams:
Markov transition counts and turn-to-turn token novelty.

Reference parity: didtool's feature matrix is order-free (transform.py
operates on a flat X); transcript/event streams carry signal in the
ORDER of turns — which state follows which, and how much a turn repeats
the previous one.  Both operators below are standard sequence features
computed point-in-time safe (each row only ever sees strictly earlier
rows of its own key).

Scale design:
- both operators need exactly ONE lag, so they delegate the shift to
  temporal.with_lags and inherit BOTH its strategies: the default
  single-(keys, order)-sort window (shared Exchange with any other
  feature on the same ordering — the transitions groupBy even rides
  the same partitioning, no second shuffle), and ``strategy=
  "bucketed"`` — the carry-in trick that bounds task size by time
  bucket instead of key size, for hot single-conversation keys.
- "has a previous row" comes from lagging a literal TRUE flag, not
  from ``prev IS NULL`` — a NULL *value* is a real level and
  transitions like any other (the didtool NULL-level convention).
- tokenization and the Jaccard are array expressions inside
  whole-stage codegen; per-row state is two token arrays (turn-sized).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .temporal import with_lags

__all__ = ["seq_ngrams", "transition_counts", "with_turn_novelty"]


def _lists(x: Sequence[str] | str) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def transition_counts(
    df: DataFrame,
    col: str,
    keys: Sequence[str] | str = "conv_id",
    order: Sequence[str] | str = ("ts", "turn_idx"),
    per_key: bool = True,
    strategy: str = "window",
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Counts of (previous value -> current value) transitions of
    ``col`` along each key's order: ``(keys..., from, to, n)``
    (``per_key=False`` drops the keys for corpus-level counts).

    The first row of a key starts no transition (excluded by a lagged
    seen-flag, NOT by ``prev IS NULL`` — a NULL *value* is a real level
    and transitions like any other).  ``strategy="bucketed"`` bounds
    task size by ``bucket_seconds`` for hot keys (with_lags carry-in);
    output is identical.
    """
    keys_l = _lists(keys)
    base = df.withColumn("__seen", F.lit(True))
    lagged = with_lags(
        base, [col, "__seen"], lags=[1],
        keys=keys, order=order, strategy=strategy,
        ts_col=ts_col, bucket_seconds=bucket_seconds,
    )
    pairs = lagged.where(F.col("__seen_lag1").isNotNull())
    grp = [*keys_l] if per_key else []
    return (
        pairs.groupBy(
            *grp, F.col(f"{col}_lag1").alias("from"), F.col(col).alias("to")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def with_turn_novelty(
    df: DataFrame,
    text_col: str,
    keys: Sequence[str] | str = "conv_id",
    order: Sequence[str] | str = ("ts", "turn_idx"),
    token_pattern: str = "[^a-z0-9]+",
    strategy: str = "window",
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Jaccard similarity of the row's distinct lowercase tokens vs the
    PREVIOUS row of its key: column ``{text_col}_jaccard_prev`` in
    [0, 1]; NULL on each key's first row and when both token sets are
    empty.  1.0 = the turn repeats the previous one exactly (a loop /
    stall signal — the inverse of novelty).

    NULL or empty text tokenizes to the empty set (so a NULL turn after
    a non-empty one scores 0.0, not NULL — the turn IS fully novel).
    ``strategy="bucketed"`` inherits the with_lags carry-in for hot
    keys; identical output.
    """
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), token_pattern),
            lambda t: t != "",
        )
    )
    toks = F.coalesce(toks, F.array().cast("array<string>"))
    out = df.withColumn("__toks", toks)
    out = with_lags(
        out, ["__toks"], lags=[1],
        keys=keys, order=order, strategy=strategy,
        ts_col=ts_col, bucket_seconds=bucket_seconds,
    )
    prev = F.col("__toks_lag1")
    inter = F.size(F.array_intersect(F.col("__toks"), prev))
    union = F.size(F.array_union(F.col("__toks"), prev))
    jac = F.when(
        prev.isNotNull() & (union > 0),
        inter.cast("double") / union.cast("double"),
    )
    return out.withColumn(f"{text_col}_jaccard_prev", jac).drop(
        "__toks", "__toks_lag1"
    )


def seq_ngrams(
    df: DataFrame,
    col: str,
    n: int = 3,
    keys: Sequence[str] | str = "conv_id",
    order: Sequence[str] | str = ("ts", "turn_idx"),
    per_key: bool = False,
    min_count: int = 1,
    strategy: str = "window",
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Sliding n-gram counts of ``col`` along each key's order — the
    n-step generalization of :func:`transition_counts` ("which
    tool-call sequences recur across conversations?"): columns
    ``(keys...?, g1..gn, n)`` with g1 the oldest element.

    Only windows fully inside one key count (the first n-1 rows of a
    key start no gram — excluded by a lagged seen-flag, so a NULL
    VALUE is a real level inside a gram, exactly the
    transition_counts contract).  ``min_count`` prunes the long tail
    before the count table leaves the aggregation.

    Scale design: one lag window (n-1 lags share the single key sort;
    ``strategy="bucketed"`` inherits with_lags' hot-key carry-in) and
    one map-side-combined groupBy whose state is the distinct-gram
    count — min_count bounds what survives to the driver/sink side.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    keys_l = _lists(keys)
    base = df.withColumn("__seen", F.lit(True))
    lagged = with_lags(
        base, [col, "__seen"], lags=list(range(1, n)),
        keys=keys, order=order, strategy=strategy,
        ts_col=ts_col, bucket_seconds=bucket_seconds,
    )
    full = lagged.where(F.col(f"__seen_lag{n - 1}").isNotNull())
    gram_cols = [
        F.col(f"{col}_lag{n - 1 - i}" if i < n - 1 else col).alias(f"g{i + 1}")
        for i in range(n)
    ]
    grp = [*keys_l] if per_key else []
    out = (
        full.groupBy(*grp, *gram_cols)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.where(F.col("n") >= int(min_count))
    return out
