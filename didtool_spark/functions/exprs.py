"""Small expression helpers shared by encoder transforms.

Fitted state is tiny (<= thousands of entries); transforms are either a
literal map expression (small vocab, stays in whole-stage codegen) or a
broadcast hash join (large vocab) — never per-row Python.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame, functions as F

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
    has_null_key, null_val = False, None
    items = []
    for k, v in mapping.items():
        if k is None:
            has_null_key, null_val = True, v
        else:
            items.append((k, v))
    expr = None
    if items:
        kv = []
        for k, v in items:
            kv.extend([F.lit(k), F.lit(v)])
        expr = F.create_map(*kv)[c]
    out = F.lit(default) if expr is None else F.coalesce(expr, F.lit(default))
    if has_null_key:
        # an explicit None key wins over `default` even when its VALUE
        # is None — same contract as with_lookup's join branch
        out = F.when(c.isNull(), F.lit(null_val)).otherwise(out)
    return out


def with_json_fields(
    df: DataFrame,
    json_col: Column | str,
    fields: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Extract typed fields from a JSON-string column (tool-call
    arguments, event payloads): ``fields`` maps output column name ->
    (JSONPath, spark type). ``get_json_object`` is a JVM expression
    (whole-stage codegen, no Python); ``try_cast`` keeps malformed
    payloads NULL instead of failing the task under ANSI mode — at
    corpus scale a poison row must never kill the job.

    For a FIXED schema read repeatedly, ``from_json`` with an explicit
    struct is the faster single-parse form; this helper is the
    schema-on-read path where each field is independent.
    """
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    out = df
    for name, (path, typ) in fields.items():
        out = out.withColumn(name, F.get_json_object(c, path).try_cast(typ))
    return out


def with_lookup(
    df: DataFrame,
    key: Column | str,
    mapping: Mapping[Any, Any],
    out_col: str,
    default: Any = None,
    max_literal: int | None = None,
) -> DataFrame:
    """``mapping.get(key, default)`` as a new column, picking the plan by
    vocabulary size: a literal ``create_map`` expression (whole-stage
    codegen) up to ``max_literal`` entries, a broadcast hash join above —
    a 10^5-entry vocabulary inlined as a literal would generate a
    megabyte-scale expression and blow past the codegen method-size
    limit. A ``None`` key in ``mapping`` maps NULL keys explicitly."""
    key = F.col(key) if isinstance(key, str) else key
    max_literal = MAP_EXPR_MAX if max_literal is None else max_literal
    items = {k: v for k, v in mapping.items() if k is not None}
    if len(items) <= max_literal:
        return df.withColumn(out_col, map_expr(key, mapping, default))
    lut = df.sparkSession.createDataFrame(
        list(items.items()), ["__lk_k", "__lk_v"]
    )
    tagged = df.withColumn("__lk", key)
    joined = tagged.join(
        F.broadcast(lut), F.col("__lk") == F.col("__lk_k"), "left"
    )
    out = F.coalesce(F.col("__lk_v"), F.lit(default))
    if None in mapping:
        out = F.when(F.col("__lk").isNull(), F.lit(mapping[None])).otherwise(out)
    return joined.withColumn(out_col, out).drop("__lk", "__lk_k", "__lk_v")
