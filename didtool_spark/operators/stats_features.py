"""Per-entity distribution features: exact group quantiles and
deterministic top-k heavy hitters.

Reference parity: didtool's quantile binning (cut.py quantile_cut) uses
global quantiles of one column; training pipelines over event streams
also want them PER ENTITY as join-back features, and the categorical
analog — the entity's most frequent items.  Neither exists in the
reference; both are standard feature-store columns.

Scale design:
- ``group_quantiles``: one map-side-combinable shuffle per call —
  Spark's exact ``percentile`` aggregate (linear interpolation, the
  quantile_cont semantics) groups by the entity key.  Entity keys are
  conversation/user-sized, so per-group state is bounded; for global or
  pathological keys callers pass ``approx=True`` to switch to
  ``approx_percentile`` (t-digest sketch, mergeable, bounded memory)
  with identical output shape.  The join back is broadcast when the
  entity table is small (hinted), shuffle otherwise.
- ``heavy_hitters``: groupBy(key, item) count (map-side combined — the
  shuffle carries one row per DISTINCT (key, item), not per event),
  then row_number over the per-key count table.  The second exchange
  partitions the already-aggregated counts, so its volume is the
  distinct-pair count; per-key window state is the entity's distinct
  items, not its event count.  Ties break deterministically:
  count DESC, item ASC.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["group_quantiles", "heavy_hitters"]


def _prob_name(p: float) -> str:
    pct = p * 100
    if abs(pct - round(pct)) < 1e-9:
        return f"p{int(round(pct))}"
    return "p" + str(pct).replace(".", "_")


def group_quantiles(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float],
    keys: Sequence[str] | str = "user_id",
    join_back: bool = False,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-``keys`` quantiles of ``value_col`` at each prob in ``probs``.

    Returns the per-key quantile table (columns ``{value_col}_{pXX}``),
    or the input with those columns broadcast-joined back when
    ``join_back=True``.  ``approx=True`` uses the mergeable t-digest
    sketch instead of the exact sort-based aggregate (for hot or global
    keys); exact is the default and matches SQL ``quantile_cont``.
    """
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    probs_l = [float(p) for p in probs]
    arr = F.array(*[F.lit(p) for p in probs_l])
    if approx:
        agg = F.approx_percentile(value_col, arr, F.lit(accuracy))
    else:
        agg = F.percentile(value_col, arr)
    q = df.groupBy(*keys_l).agg(agg.alias("__q"))
    names = [f"{value_col}_{_prob_name(p)}" for p in probs_l]
    q = q.select(
        *keys_l,
        *[F.col("__q")[i].alias(n) for i, n in enumerate(names)],
    )
    if not join_back:
        return q
    return df.join(F.broadcast(q), keys_l, "left")


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    keys: Sequence[str] | str = "user_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` most frequent ``item_col`` values per ``keys``.

    Output: keys + (rank, item, n) — rank 1..k by count DESC with
    deterministic item ASC tie-break.  NULL items count as a value
    (kept; filter upstream to drop).
    """
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    counts = df.groupBy(*keys_l, F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(*keys_l).orderBy(
        F.col("n").desc(), F.col("item").asc_nulls_last()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(*keys_l, "rank", "item", "n")
    )
