"""Blocked record linkage: fuzzy-duplicate pairs under an edit-distance
threshold without the O(n^2) cross join.

The MinHash/SimHash family (dedup.py) targets long documents; entity
RESOLUTION targets short strings (names, addresses, product titles)
where the right primitive is edit distance.  The classic scale recipe:

1. normalize (lower, squeeze whitespace);
2. emit one or more cheap BLOCKING KEYS per record (here: character
   prefix of the normalized string and, optionally, its length
   bucket); only records sharing a block are ever compared;
3. self-join within blocks (id_a < id_b), score candidates with the
   JVM-side ``levenshtein`` — whole-stage codegen, no UDF;
4. keep pairs at distance <= max_dist.

Recall/cost is the blocking trade: a longer prefix means fewer, purer
blocks but misses early-character typos (classic multi-pass blocking
runs several key functions and unions candidates — ``block_exprs``
takes a list).  Skew safety mirrors the MinHash hot-bucket bound
(dedup.py): blocks larger than ``max_block`` are dropped with a
map-side count, so one degenerate key (empty names, "unknown") cannot
quadratically blow a task; the drop is observable in the returned
plan (filter on the counted block size).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_name", "fuzzy_pairs"]


def normalize_name(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    prefix_len: int = 3,
    length_bucket: int | None = 4,
    max_block: int = 10_000,
    block_exprs: Sequence[Column] | None = None,
) -> DataFrame:
    """Pairs ``(id_a, id_b, text_a, text_b, dist)`` with
    ``levenshtein(norm_a, norm_b) <= max_dist``, compared only inside
    blocks.  Default blocking key: (normalized prefix, length bucket).
    Length bucketing is LOSS-FREE for the edit-distance bound: each
    record is emitted under its own bucket AND the next one, and a
    pair is kept at the greater of the two buckets — since
    ``length_bucket >= max_dist`` is enforced, two strings within
    ``max_dist`` edits differ by at most one bucket and always meet.
    (Prefix blocking remains the recall trade: early-character typos
    land in different prefix blocks; ``block_exprs`` overrides the key
    entirely — pass several calls' unions for multi-pass blocking.)
    """
    if length_bucket and block_exprs is None and length_bucket < max_dist:
        raise ValueError(
            "length_bucket must be >= max_dist (buckets could otherwise "
            f"differ by more than one): {length_bucket} < {max_dist}"
        )
    # the key is computed BEFORE the narrowing select so custom
    # block_exprs may reference any input column (or "__norm")
    base = df.withColumn("__norm", normalize_name(text_col))
    use_lb = block_exprs is None and bool(length_bucket)
    if block_exprs is not None:
        base = base.withColumn("__bk", F.struct(*block_exprs))
    else:
        base = base.withColumn(
            "__pfx", F.substring("__norm", 1, prefix_len)
        )
        if use_lb:
            base = base.withColumn(
                "__lb",
                F.floor(F.length("__norm") / F.lit(length_bucket)).cast("int"),
            ).withColumn(
                # emit under own bucket and the next: the boundary-
                # straddling pair meets at the greater bucket
                "__jk",
                F.explode(F.array(F.col("__lb"), F.col("__lb") + 1)),
            )
            base = base.withColumn("__bk", F.struct("__pfx", "__jk"))
        else:
            base = base.withColumn("__bk", F.struct("__pfx"))
    lb_cols = ["__lb"] if use_lb else []
    blocked = base.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        "__norm",
        "__bk",
        *lb_cols,
    )

    # map-side hot-block bound: count once, drop degenerate blocks
    sizes = blocked.groupBy("__bk").agg(F.count(F.lit(1)).alias("__bn"))
    blocked = blocked.join(
        sizes.where(F.col("__bn") <= max_block).select("__bk"), "__bk"
    )

    a = blocked.select(
        F.col("__bk"),
        F.col("id").alias("id_a"),
        F.col("text").alias("text_a"),
        F.col("__norm").alias("__na"),
        *[F.col(c).alias(f"{c}_a") for c in lb_cols],
    )
    b = blocked.select(
        F.col("__bk"),
        F.col("id").alias("id_b"),
        F.col("text").alias("text_b"),
        F.col("__norm").alias("__nb"),
        *[F.col(c).alias(f"{c}_b") for c in lb_cols],
    )
    out = a.join(b, "__bk").where(F.col("id_a") < F.col("id_b"))
    if use_lb:
        # dedupe the double emission: keep each pair only at the
        # greater of its two buckets
        out = out.where(
            F.col("__bk.__jk")
            == F.greatest(F.col("__lb_a"), F.col("__lb_b"))
        )
    # thresholded levenshtein (r6): the 3-arg form computes only the
    # |max_dist|-wide band of the DP matrix and bails out early —
    # O(n·k) per pair instead of O(n²) — returning -1 above the bound;
    # for kept pairs (d <= max_dist) it returns the exact distance, so
    # the output is identical (asserted in tests/test_linkage.py)
    return (
        out.withColumn("dist", F.levenshtein("__na", "__nb", max_dist))
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", "text_a", "text_b", "dist")
    )
