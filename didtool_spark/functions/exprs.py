"""Small expression helpers shared by encoder transforms.

Fitted state is tiny (<= thousands of entries); transforms are either a
literal map expression (small vocab, stays in whole-stage codegen) or a
broadcast hash join (large vocab) — never per-row Python.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

MAP_EXPR_MAX = 256


def is_missing(col: Column | str) -> Column:
    """NULL or float-NaN, ANSI-safe for any column type (try_cast avoids
    Spark 4 ANSI cast errors on non-numeric strings)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | F.coalesce(F.isnan(c.try_cast("double")), F.lit(False))


def map_expr(
    col: Column | str,
    mapping: Mapping[Any, Any],
    default: Any = None,
) -> Column:
    """Literal-lookup expression: mapping.get(col, default). NULL keys in
    ``mapping`` are honored via an explicit isNull branch."""
    c = F.col(col) if isinstance(col, str) else col
    null_val = None
    items = []
    for k, v in mapping.items():
        if k is None:
            null_val = v
        else:
            items.append((k, v))
    expr = None
    if items:
        kv = []
        for k, v in items:
            kv.extend([F.lit(k), F.lit(v)])
        expr = F.create_map(*kv)[c]
    out = F.lit(default) if expr is None else F.coalesce(expr, F.lit(default))
    if null_val is not None:
        out = F.when(c.isNull(), F.lit(null_val)).otherwise(out)
    return out


def lookup_via_join(
    df: DataFrame,
    col: str,
    mapping: Mapping[Any, Any],
    out_col: str,
    default: Any = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Broadcast-join lookup for large vocabularies."""
    spark = spark or df.sparkSession
    lut = spark.createDataFrame(
        [(k, v) for k, v in mapping.items() if k is not None], ["__k", "__v"]
    )
    joined = df.join(F.broadcast(lut), df[col] == lut["__k"], "left")
    out = joined.withColumn(out_col, F.coalesce("__v", F.lit(default)))
    return out.drop("__k", "__v")
