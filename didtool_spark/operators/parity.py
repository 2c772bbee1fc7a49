"""Per-turn transcript parity validation.

The engine's output contract is "per-turn text equality under stable
turn ordering" against a reference materialization.  This operator IS
that check, distributed: align two transcript tables on the stable turn
key and classify every aligned position, so a 10^12-turn regression diff
is one sort-merge join + one aggregate instead of a driver-side compare.

Reference parity: didtool verifies transforms with pandas
``assert_frame_equal`` inside its test suite (tests/test_transform.py);
there is no distributed equivalent — this is the Spark-native
replacement for the same contract.

Scale design: ONE full-outer sort-merge join on the turn key (both
sides shuffle-partitioned identically, so Catalyst plans a single
exchange per side), classification is pure codegen CASE arithmetic, and
the summary is a map-side-combinable groupBy.  ``detail=True`` returns
the per-turn classification instead (for writing a diff table next to a
checkpoint); the default summary keeps the driver result O(#statuses).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["transcript_parity"]

STATUSES = ("match", "diff", "left_only", "right_only")


def transcript_parity(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    compare_cols: Sequence[str] = ("text",),
    detail: bool = False,
) -> DataFrame:
    """Align ``left`` and ``right`` on ``keys`` and classify each turn.

    status per aligned key:
      - ``match``       present in both, every compare col null-safe equal
      - ``diff``        present in both, some compare col differs
      - ``left_only`` / ``right_only``  unmatched key

    detail=False (default): one row per (status), with ``n_turns`` and
    ``n_convs`` (distinct first key component).  detail=True: one row
    per turn — ``keys + (status, diff_cols)`` where ``diff_cols`` is the
    array of differing column names (empty unless status='diff').
    """
    keys_l = list(keys)
    cmp_l = list(compare_cols)
    lsel = left.select(
        *[F.col(k).alias(f"__lk_{k}") for k in keys_l],
        *[F.col(c).alias(f"__l_{c}") for c in cmp_l],
        F.lit(True).alias("__in_l"),
    )
    rsel = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys_l],
        *[F.col(c).alias(f"__r_{c}") for c in cmp_l],
        F.lit(True).alias("__in_r"),
    )
    cond = None
    for k in keys_l:
        eq = F.col(f"__lk_{k}") == F.col(f"__rk_{k}")
        cond = eq if cond is None else (cond & eq)
    j = lsel.join(rsel, cond, "full_outer")

    diff_cols = F.filter(
        F.array(*[
            F.when(
                ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}")), F.lit(c)
            )
            for c in cmp_l
        ]),
        lambda x: x.isNotNull(),
    )
    status = (
        F.when(F.col("__in_l").isNull(), F.lit("right_only"))
        .when(F.col("__in_r").isNull(), F.lit("left_only"))
        .when(F.size(diff_cols) > 0, F.lit("diff"))
        .otherwise(F.lit("match"))
    )
    key_exprs = [
        F.coalesce(F.col(f"__lk_{k}"), F.col(f"__rk_{k}")).alias(k)
        for k in keys_l
    ]
    classified = j.select(
        *key_exprs,
        status.alias("status"),
        F.when(status == "diff", diff_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("diff_cols"),
    )
    if detail:
        return classified
    return (
        classified.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.countDistinct(keys_l[0]).alias("n_convs"),
        )
    )
