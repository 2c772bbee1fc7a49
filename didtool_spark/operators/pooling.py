"""Per-group embedding pooling: mean / max / L2-normalized-mean vectors
per entity.

Reference parity: didtool has no vector columns; a transcript feature
store does (turn/document embeddings), and the standard way to lift
them to the entity level is pooling — a conversation's embedding is the
mean (or max) of its turns'.

Scale design: pooling via ``posexplode -> groupBy(keys, dim)`` — the
shuffle carries (keys x dim) PARTIALLY AGGREGATED rows (map-side
combine on avg/max), never the raw vectors twice, and a hot entity's
work spreads over ``dim`` reducers instead of one.  The array
reassembly is a second groupBy over the already-pooled (keys x dim)
table (tiny).  ``long=True`` skips reassembly and returns the
(keys, dim, ...) long form directly — the shape a feature store joins
or a gate oracle replays.  No Python in either path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pool_embeddings"]

_AGGS = ("mean", "max", "min")


def pool_embeddings(
    df: DataFrame,
    emb_col: str,
    keys: Sequence[str] | str,
    aggs: Sequence[str] = ("mean",),
    long: bool = False,
    l2_normalize: bool = False,
) -> DataFrame:
    """Pool ``emb_col`` (array<float/double>) per ``keys``.

    Returns one row per key group with ``{emb_col}_{agg}`` array
    columns (dims ordered), plus ``n_vecs`` = pooled vector count.
    Rows with a NULL embedding are excluded; ragged dims pool per-dim
    over the vectors that have that dim (defined, documented behavior —
    enforce fixed width upstream if that matters).  ``long=True``
    returns ``(keys..., dim, <agg>...)`` instead (no reassembly).
    ``l2_normalize`` rescales each pooled MEAN array to unit L2 norm
    (zero vectors stay zero); mean-of-normalized is the caller's
    composition.
    """
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    bad = [a for a in aggs if a not in _AGGS]
    if bad:
        raise ValueError(f"unsupported poolings {bad}; pick from {_AGGS}")
    v = F.col("__v").cast("double")
    fns = {"mean": F.avg(v), "max": F.max(v), "min": F.min(v)}
    e = df.where(F.col(emb_col).isNotNull()).select(
        *keys_l, F.posexplode(emb_col).alias("__dim", "__v")
    )
    per = e.groupBy(*keys_l, "__dim").agg(
        *[fns[a].alias(f"__{a}") for a in aggs],
        F.count(F.lit(1)).alias("__n"),
    )
    if long:
        return per.select(
            *keys_l,
            F.col("__dim").alias("dim"),
            *[F.col(f"__{a}").alias(a) for a in aggs],
            F.col("__n").alias("n_vecs"),
        )
    packed = per.groupBy(*keys_l).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__dim").alias("d"),
                    *[F.col(f"__{a}").alias(a) for a in aggs],
                )
            )
        ).alias("__arr"),
        F.max("__n").alias("n_vecs"),
    )
    for a in aggs:
        # closure factory keeps the HOF lambda unary (temporal pattern)
        def pick(tag):
            return lambda s: s[tag]

        col = F.transform(F.col("__arr"), pick(a))
        if a == "mean" and l2_normalize:
            nrm = F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))
            # single-element transform = let-binding: the norm is
            # computed once per row, not once per element (see mi.py)
            col = F.transform(
                F.array(nrm),
                lambda n: F.when(n > 0, F.transform(col, lambda x: x / n)).otherwise(
                    col
                ),
            )[0]
        packed = packed.withColumn(f"{emb_col}_{a}", col)
    return packed.drop("__arr")
