"""Count-min sketch: mergeable approximate frequency counting.

The exact sibling (stats_features.heavy_hitters) shuffles one row per
DISTINCT item — at 10^12 turns a high-cardinality item column (URLs,
n-grams, tool-call names) makes even that reduction enormous.  The
count-min sketch (Cormode & Muthukrishnan 2005) bounds the state at
``depth x width`` counters REGARDLESS of cardinality, with one-sided
error: est >= true, and est <= true + eps*N with probability 1-delta
for width = ceil(e/eps), depth = ceil(ln(1/delta)).

Spark mapping — the sketch is literally an aggregation:

- build: each occurrence emits ``depth`` (row j, bucket H_j(item))
  cells; ``groupBy(j, bucket).sum`` IS the sketch.  Partial
  aggregation makes every mapper emit at most depth*width rows, so
  the shuffle is bounded by the sketch size, not the data — the
  mergeability of CMS is exactly Spark's map-side combine.
- merge: union + the same groupBy (sketches add cell-wise).
- query: explode the probe items to (j, bucket), broadcast-join the
  depth*width-row sketch, take min over j (absent cell = 0).

Hashing follows the dsir.py convention: ``xxhash64(item, j)`` —
JVM-side, whole-stage codegen — as the engine default, ``md5_60``
(60-bit md5 prefix, DuckDB-replayable as
``('0x' || substr(md5(j || ':' || item), 1, 15))::BIGINT % width``)
for oracle replay only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_query"]


def _cms_bucket(item: Column, j: int, width: int, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(item, F.lit(j)), F.lit(width)).cast("long")
    if hash_fn == "md5_60":
        key = F.concat(F.lit(str(j)), F.lit(":"), item)
        return (
            F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
            % width
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def _cms_params_meta(width: int, depth: int, hash_fn: str) -> dict:
    return {"cms_width": width, "cms_depth": depth, "cms_hash_fn": hash_fn}


def _cms_read_meta(sketch: DataFrame) -> dict:
    for f in sketch.schema.fields:
        if f.name == "n" and f.metadata and "cms_width" in f.metadata:
            return dict(f.metadata)
    return {}


def cms_build(
    df: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    hash_fn: str = "xxhash64",
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch table ``(j, bucket, n)`` — at most ``depth * width`` rows.
    NULL items are skipped; ``weight_col`` counts each occurrence by a
    weight instead of 1 (token counts, bytes, revenue).

    The build parameters ride along as column metadata on ``n``, so
    ``cms_query``/``cms_merge`` can reject a probe or merge whose
    width/depth/hash_fn disagree with the sketch — a silent mismatch
    hashes probes into the wrong cells and can UNDER-estimate,
    breaking the est >= true guarantee."""
    item = F.col(item_col)
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    cells = df.where(item.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(item, j, width, hash_fn).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
        w.alias("__w"),
    )
    return cells.groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket")).agg(
        F.sum("__w").alias(
            "n", metadata=_cms_params_meta(width, depth, hash_fn)
        )
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches (the distributive merge a
    per-day / per-source rollup wants).  Sketches carrying build
    metadata must agree on (width, depth, hash_fn) — adding cells from
    differently-hashed sketches is meaningless."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    metas = [_cms_read_meta(s) for s in sketches]
    known = [m for m in metas if m]
    if known and any(m != known[0] for m in known[1:]):
        raise ValueError(
            f"cms_merge: sketches disagree on build parameters: {known}"
        )
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    merged = u.groupBy("j", "bucket").agg(F.sum("n").alias("n"))
    if known:
        merged = merged.withColumn(
            "n", F.col("n").alias("n", metadata=known[0])
        )
    return merged


def cms_query(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    hash_fn: str = "xxhash64",
    est_col: str = "est",
) -> DataFrame:
    """``items`` + ``est_col``: the CMS frequency estimate per row's
    ``item_col`` (min over the depth counters; absent counter = 0).
    Estimates are computed once per DISTINCT item value and joined
    back, so duplicate probe rows and arbitrary extra columns
    (including ones named j/bucket/n) pass through untouched; rows
    with a NULL item get a NULL estimate (the sketch never counted
    them).  The sketch is broadcast — the probe never shuffles beyond
    the distinct.

    If the sketch carries cms_build metadata, the probe parameters are
    validated against it (a mismatch re-hashes probes into the wrong
    cells and silently breaks est >= true)."""
    if est_col in items.columns:
        raise ValueError(f"items already has a column named {est_col!r}")
    meta = _cms_read_meta(sketch)
    if meta:
        want = _cms_params_meta(width, depth, hash_fn)
        if want != meta:
            raise ValueError(
                "cms_query probe parameters disagree with the sketch's "
                f"build parameters: probe={want} sketch={meta}"
            )
    sk = sketch.select(
        F.col("j").alias("__cms_j"),
        F.col("bucket").alias("__cms_b"),
        F.col("n").alias("__cms_n"),
    )
    probes = (
        items.select(F.col(item_col).alias("__cms_item"))
        .where(F.col("__cms_item").isNotNull())
        .distinct()
        .select(
            "__cms_item",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _cms_bucket(
                                F.col("__cms_item"), j, width, hash_fn
                            ).alias("bucket"),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("__p"),
        )
    )
    est = (
        probes.join(
            F.broadcast(sk),
            (F.col("__p.j") == F.col("__cms_j"))
            & (F.col("__p.bucket") == F.col("__cms_b")),
            "left",
        )
        .groupBy("__cms_item")
        .agg(F.min(F.coalesce(F.col("__cms_n"), F.lit(0))).alias(est_col))
    )
    # plain equi-join (NULL items match nothing -> NULL estimate); the
    # est table is one row per distinct item, so it is NOT broadcast —
    # only the depth x width sketch was
    return items.join(
        est, F.col(item_col) == F.col("__cms_item"), "left"
    ).drop("__cms_item")
