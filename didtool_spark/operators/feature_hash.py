"""Hashing-trick features: crossed-feature buckets and fixed-width
hashed sparse vectors.

Reference parity: didtool's encoders (transformer.py Category/OneHot/
List) all require a FITTED vocabulary — a driver-side map of every
category.  At web scale the crossed-feature space (event_type x
channel x geo ...) has no enumerable vocabulary; the standard answer
is the hashing trick (Weinberger et al. 2009): a stateless hash maps
any category (or cross) into a fixed index space, so there is nothing
to fit, nothing to broadcast, and unseen categories at serving time
land in a deterministic bucket instead of erroring.

Scale design:
- zero state, zero shuffle, zero fit pass: every output column is a
  pure whole-stage-codegen expression over the row — the transform
  streams at scan speed whatever the cardinality.
- ``hash_fn="xxhash64"`` (default) keeps hashing JVM-side; the
  ``md5_60`` variant exists only so the driver's DuckDB oracle can
  replay the exact bucket ids (the dsir.py pattern).
- ``hash_vectorize`` merges per-row duplicate indices with an
  expression-level sort + fold (arrays are #cols-sized — tiny), so the
  output is a canonical sparse vector: indices strictly increasing,
  signed values summed.  No Python in the row path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dsir import _bucket_expr

__all__ = ["hashed_cross", "hash_vectorize", "hash_vectorize_long"]

# NULL-safe cross key separators: unit separator between components,
# NUL as the NULL sentinel (neither occurs in real categorical values)
_SEP = "\x1f"
_NULL = "\x00"


def _cross_key(cols: Sequence[Column | str]) -> Column:
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(_NULL))
        for c in cols
    ]
    return F.concat_ws(_SEP, *parts)


def hashed_cross(
    df: DataFrame,
    cols: Sequence[str],
    n_buckets: int,
    out_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Add one bucket column for the interaction of ``cols``.

    NULL components are a level (the didtool convention), encoded with
    a NUL sentinel so ``(NULL, 'a')`` and ``('a', NULL)`` cross to
    different buckets.  Output: ``{c1}_x_{c2}_b`` (long in
    ``[0, n_buckets)``) unless ``out_col`` is given.
    """
    name = out_col or ("_x_".join(cols) + "_b")
    return df.withColumn(name, _bucket_expr(_cross_key(cols), n_buckets, hash_fn))


def _signed(tok: Column, v: Column, hash_fn: str) -> Column:
    """Sign-hash (a second, salted hash bit): halves collision bias so
    colliding tokens cancel in expectation rather than accumulate."""
    bit = _bucket_expr(F.concat(tok, F.lit("#s")), 2, hash_fn)
    return F.when(bit == 0, v).otherwise(-v)


def _entry_structs(
    cat_cols: Sequence[str],
    num_cols: Sequence[str],
    n_features: int,
    hash_fn: str,
    signed: bool,
) -> list[Column]:
    """The per-row (idx, v) entry structs shared by the canonical-array
    and long-form outputs (numeric NULLs drop out as NULL structs)."""
    entries = []
    for c in cat_cols:
        tok = F.concat(
            F.lit(c + "="), F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
        )
        v = F.lit(1.0)
        entries.append(
            F.struct(
                _bucket_expr(tok, n_features, hash_fn).alias("idx"),
                (_signed(tok, v, hash_fn) if signed else v).alias("v"),
            )
        )
    for c in num_cols:
        tok = F.lit(c)
        v = F.col(c).cast("double")
        entries.append(
            F.when(
                v.isNotNull(),
                F.struct(
                    _bucket_expr(tok, n_features, hash_fn).alias("idx"),
                    (_signed(tok, v, hash_fn) if signed else v).alias("v"),
                ),
            )
        )
    return entries


def hash_vectorize_long(
    df: DataFrame,
    id_col: str,
    cat_cols: Sequence[str] = (),
    num_cols: Sequence[str] = (),
    n_features: int = 2**18,
    hash_fn: str = "xxhash64",
    signed: bool = True,
) -> DataFrame:
    """``hash_vectorize`` in exploded long form: one ``(id, idx, v)``
    row per populated slot, duplicate indices summed per row-id.

    Value-identical to exploding ``hash_vectorize``'s canonical array
    (same tokens, same hashes; per-(id, idx) sums see the same addend
    multiset — parity-tested in tests/test_pipeline_ops.py), but the
    merge is a map-side-combined groupBy instead of the per-row
    expression fold: the fold is an interpreted HOF whose
    re-evaluation under an explode costs ~4x the hashing itself
    (measured at sf1.0: explode-over-fold 7.5s vs 2.3s for the
    vectorize pass alone), while this plan hashes each token once and
    shuffles only (id, idx, v) triples."""
    entries = _entry_structs(cat_cols, num_cols, n_features, hash_fn, signed)
    e = df.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("__e")
    ).where(F.col("__e").isNotNull())
    return (
        e.groupBy(id_col, F.col("__e.idx").alias("idx"))
        .agg(F.sum("__e.v").alias("v"))
    )


def hash_vectorize(
    df: DataFrame,
    cat_cols: Sequence[str] = (),
    num_cols: Sequence[str] = (),
    n_features: int = 2**18,
    out_col: str = "features",
    hash_fn: str = "xxhash64",
    signed: bool = True,
) -> DataFrame:
    """Fixed-width hashed sparse vector per row.

    Tokens: ``"{col}=" + value`` for categorical columns (NULL is a
    level, weight 1.0) and ``"{col}"`` for numeric columns (the value
    is the weight; NULL numerics drop out).  Each token lands at
    ``hash(token) % n_features`` with an optional sign hash; per-row
    duplicate indices are summed and the result is emitted as a
    canonical ``array<struct<idx:long, v:double>>`` with strictly
    increasing ``idx``.
    """
    entries = _entry_structs(cat_cols, num_cols, n_features, hash_fn, signed)
    arr = F.array_sort(F.filter(F.array(*entries), lambda e: e.isNotNull()))
    # fold merges runs of equal idx (array is sorted): acc = emitted
    # prefix + the open (idx, sum) tail
    init = F.struct(
        F.array().cast("array<struct<idx:long,v:double>>").alias("out"),
        F.lit(-1).cast("long").alias("idx"),
        F.lit(0.0).alias("v"),
    )

    def step(acc, e):
        same = e["idx"] == acc["idx"]
        flushed = F.when(
            (acc["idx"] >= 0) & ~same,
            F.concat(
                acc["out"],
                F.array(F.struct(acc["idx"].alias("idx"), acc["v"].alias("v"))),
            ),
        ).otherwise(acc["out"])
        return F.struct(
            flushed.alias("out"),
            e["idx"].alias("idx"),
            F.when(same, acc["v"] + e["v"]).otherwise(e["v"]).alias("v"),
        )

    def fin(acc):
        return F.when(
            acc["idx"] >= 0,
            F.concat(
                acc["out"],
                F.array(F.struct(acc["idx"].alias("idx"), acc["v"].alias("v"))),
            ),
        ).otherwise(acc["out"])

    return df.withColumn(out_col, F.aggregate(arr, init, step, fin))
