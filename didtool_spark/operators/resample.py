"""Fixed-grid time resampling: align per-entity event streams onto a
regular time grid with per-bucket aggregation and forward-fill.

Reference parity: didtool assumes an already-regular feature matrix;
building one from irregular transcript/event streams is the pandas
``df.resample('1min').last().ffill()`` step — this is that operator,
distributed and point-in-time safe (a grid cell only ever sees events
inside or before its own bucket).

Scale design:
- per-(key, bucket) aggregation first: ONE map-side-combined groupBy —
  the shuffle carries aggregated cells, never raw events.
- the dense grid materializes per KEY via ``sequence() + explode`` over
  the key's [min_bucket, max_bucket] span — generated distributedly
  next to the data (no driver loop, no cross join); a key's grid size
  is span/step, so pick ``step_s`` accordingly (documented, the same
  contract pandas resample has).
- forward-fill is ``last(ignorenulls)`` over one (key, bucket) sort —
  the temporal.py ffill pattern; occupied-cell joins stay on the same
  partitioning.
- "last value in bucket" uses the deterministic max-of-struct
  (ts, value) tie-break — the heavy_hitters/profile pattern, exactly
  replayable in SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_grid", "time_rollup", "distinct_rollup"]

_AGGS = ("last", "sum", "avg", "count", "max", "min")


def resample_grid(
    df: DataFrame,
    value_col: str,
    step_s: int,
    keys: Sequence[str] | str = "conv_id",
    ts_col: str = "ts",
    agg: str = "last",
    ffill: bool = False,
) -> DataFrame:
    """One row per (key, grid bucket) from each key's first to last
    event: ``(keys..., bucket_ts, {value_col}_{agg} [, n_events])``.

    ``agg="last"`` takes the bucket's latest value (ties on the exact
    same timestamp break toward the larger value — deterministic);
    empty buckets are NULL (or forward-filled from the previous
    occupied bucket when ``ffill=True`` — never backward, so the grid
    stays leakage-free).  ``n_events`` counts the bucket's rows (0 for
    gap cells).
    """
    if agg not in _AGGS:
        raise ValueError(f"unsupported agg {agg!r}; pick from {_AGGS}")
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    out_col = f"{value_col}_{agg}"
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    step_us = int(step_s) * 1_000_000
    b = df.withColumn("__b", F.floor(us / F.lit(step_us))).withColumn("__us", us)
    v = F.col(value_col).cast("double")
    if agg == "last":
        cell = F.max(
            F.when(v.isNotNull(), F.struct(F.col("__us").alias("u"), v.alias("v")))
        )["v"]
    elif agg == "count":
        cell = F.count(v).cast("long")
    else:
        cell = getattr(F, agg)(v)
    cells = b.groupBy(*keys_l, "__b").agg(
        cell.alias("__v"), F.count(F.lit(1)).alias("__n")
    )
    # dense per-key grid, generated next to the data
    span = cells.groupBy(*keys_l).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = span.select(
        *keys_l, F.explode(F.sequence("__lo", "__hi")).alias("__b")
    )
    j = grid.join(cells, [*keys_l, "__b"], "left")
    val = F.col("__v")
    if ffill:
        w = (
            Window.partitionBy(*keys_l)
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        val = F.last("__v", ignorenulls=True).over(w)
    return j.select(
        *keys_l,
        F.timestamp_micros(F.col("__b") * F.lit(step_us)).alias("bucket_ts"),
        val.alias(out_col),
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_events"),
    )


# --------------------------------------------------------------- rollup

# canonical fine -> coarse order; "week" is terminal (ISO weeks cross
# month/year boundaries, so nothing calendar-nests over a week bucket)
_GRAINS = ("minute", "hour", "day", "week", "month", "quarter", "year")
_ROLLUP_AGGS = ("count", "sum", "min", "max", "avg")


def _nests(fine: str, coarse: str) -> bool:
    """True when every `fine` bucket lies inside ONE `coarse` bucket —
    the condition for computing `coarse` by merging `fine` partials."""
    if fine == "week":
        return False
    fi, ci = _GRAINS.index(fine), _GRAINS.index(coarse)
    return fi < ci


def time_rollup(
    df: DataFrame,
    specs: Sequence[tuple[str, str]],
    grains: Sequence[str] = ("hour", "day", "week"),
    keys: Sequence[str] | str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Hierarchical time-grain rollup (continuous-aggregate style):
    one row per (key, grain, bucket_ts) with every spec's aggregate —
    ``(keys..., grain, bucket_ts, {col}_{agg}..., n_events)``.

    specs: (col, agg) with agg in {"count", "sum", "min", "max",
    "avg"}; ``count``/``avg`` follow SQL NULL semantics (non-NULL
    count; avg = sum/count over non-NULLs, NULL for an empty bucket).

    Scale design — the point of this operator vs. N independent
    groupBys: the BASE TABLE IS SCANNED ONCE.  The finest grain is one
    map-side-combined groupBy producing MERGEABLE partials (sum, count,
    min, max — avg carried as sum+count); every coarser grain
    re-aggregates the previous grain's tiny partial table
    (`date_trunc` of a finer bucket start is exact, so partials land in
    exactly one coarser bucket).  The union branches are built from
    the SAME partial DataFrame, so their exchange subtrees
    canonicalize identically and AQE's exchange reuse
    (spark.sql.exchange.reuse, on by default) executes each shared
    shuffle once — the day branch rides the hour branch's shuffle, the
    week branch the day merge's (asserted in tests/test_resample.py).
    At 100 TB the day/week/month rollups
    cost a shuffle over |hour buckets x keys| rows, not another corpus
    scan.  Grains that don't calendar-nest over the finest requested
    grain fall back to the finest NESTING partial; the one shape with
    no nesting partial — a grain list LED by "week" — synthesizes an
    internal day partial so the base is still scanned only once.  Exact
    distinct is deliberately unsupported: it does not merge; use
    approx sketches for that at scale.
    """
    grains_l = _check_grains(grains)
    for _, a in specs:
        if a not in _ROLLUP_AGGS:
            raise ValueError(
                f"unsupported agg {a!r}; pick from {_ROLLUP_AGGS}"
            )
    keys_l = [keys] if isinstance(keys, str) else list(keys)

    # partial columns: one (sum, cnt) / min / max per DISTINCT (col, agg
    # family) — shared by avg/sum/count specs over the same column
    need: dict[tuple[str, str], str] = {}  # (col, family) -> partial name
    for c, a in specs:
        fam = {"count": "cnt", "sum": "sum", "avg": "avg",
               "min": "min", "max": "max"}[a]
        fams = ("sum", "cnt") if fam == "avg" else (fam,)
        for f_ in fams:
            need.setdefault((c, f_), f"__{f_}_{c}")

    def first_aggs():
        out = [F.count(F.lit(1)).alias("__n")]
        for (c, fam), name in need.items():
            v = F.col(c)
            e = {
                "sum": F.sum(v), "cnt": F.count(v).cast("long"),
                "min": F.min(v), "max": F.max(v),
            }[fam]
            out.append(e.alias(name))
        return out

    def merge_aggs():
        out = [F.sum("__n").cast("long").alias("__n")]
        for (_, fam), name in need.items():
            v = F.col(name)
            e = {
                "sum": F.sum(v), "cnt": F.sum(v).cast("long"),
                "min": F.min(v), "max": F.max(v),
            }[fam]
            out.append(e.alias(name))
        return out

    def finalize(partial: DataFrame, grain: str) -> DataFrame:
        cols = [*keys_l, F.lit(grain).alias("grain"),
                F.col("__bucket").alias("bucket_ts")]
        for c, a in specs:
            if a == "avg":
                e = F.col(need[(c, "sum")]) / F.col(need[(c, "cnt")])
            elif a == "count":
                e = F.col(need[(c, "cnt")])
            else:
                e = F.col(need[(c, a)])
            cols.append(e.alias(f"{c}_{a}"))
        cols.append(F.col("__n").alias("n_events"))
        return partial.select(*cols)

    partials: dict[str, DataFrame] = {}
    if grains_l[0] == "week" and len(grains_l) > 1:
        # nothing calendar-nests over a week bucket, so month/quarter/
        # year after a leading "week" would each rescan the base; an
        # INTERNAL day partial (computed once, not emitted) lets every
        # requested grain merge partials instead — one base scan total
        partials["day"] = df.groupBy(
            *keys_l, F.date_trunc("day", F.col(ts_col)).alias("__bucket")
        ).agg(*first_aggs())
    outs = []
    for g in grains_l:
        src = None
        for fg in reversed([x for x in partials if _nests(x, g)]):
            src = fg
            break
        if src is None:
            p = (
                df.groupBy(
                    *keys_l,
                    F.date_trunc(g, F.col(ts_col)).alias("__bucket"),
                ).agg(*first_aggs())
            )
        else:
            p = (
                partials[src]
                .groupBy(
                    *keys_l,
                    F.date_trunc(g, F.col("__bucket")).alias("__bucket"),
                ).agg(*merge_aggs())
            )
        partials[g] = p
        outs.append(finalize(p, g))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _check_grains(grains: Sequence[str]) -> list[str]:
    grains_l = list(grains)
    if not grains_l:
        raise ValueError("grains must be non-empty")
    for g in grains_l:
        if g not in _GRAINS:
            raise ValueError(f"unknown grain {g!r}; pick from {_GRAINS}")
    if sorted(grains_l, key=_GRAINS.index) != grains_l or len(
        set(grains_l)
    ) != len(grains_l):
        raise ValueError("grains must be unique and ordered fine -> coarse")
    return grains_l


def distinct_rollup(
    df: DataFrame,
    col: str,
    grains: Sequence[str] = ("hour", "day", "week"),
    keys: Sequence[str] | str = "conv_id",
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Approximate-distinct time-grain rollup via HyperLogLog sketches:
    one row per (key, grain, bucket_ts) with ``{col}_distinct`` (the
    sketch estimate) and ``n_events``.

    This is the mergeable path ``time_rollup`` deliberately refuses:
    exact distinct does not merge across buckets, but HLL registers do
    (register-max union), so the finest grain is ONE map-side-combined
    ``hll_sketch_agg`` pass over the base and every coarser grain is an
    ``hll_union_agg`` over the finer grain's tiny sketch table.  The
    merged estimate carries the same error bound as sketching the base
    directly — union is lossless in register space — though the two
    need not be numerically identical: datasketches keeps small sets
    in an exact sparse mode and union may promote to dense registers
    (both paths are deterministic for a fixed input and bound-checked
    in tests).  Standard error ~1.04 / sqrt(2^lg_k) (~1.6% at the
    default lg_k=12, 4 KiB per sketch).
    Calendar nesting and the terminal-week rule follow ``time_rollup``.
    """
    grains_l = _check_grains(grains)
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    out_col = f"{col}_distinct"

    partials: dict[str, DataFrame] = {}
    outs = []
    for g in grains_l:
        src = None
        for fg in reversed([x for x in partials if _nests(x, g)]):
            src = fg
            break
        if src is None:
            p = df.groupBy(
                *keys_l, F.date_trunc(g, F.col(ts_col)).alias("__bucket")
            ).agg(
                F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("__sk"),
                F.count(F.lit(1)).alias("__n"),
            )
        else:
            p = (
                partials[src]
                .groupBy(
                    *keys_l,
                    F.date_trunc(g, F.col("__bucket")).alias("__bucket"),
                ).agg(
                    F.hll_union_agg("__sk").alias("__sk"),
                    F.sum("__n").cast("long").alias("__n"),
                )
            )
        partials[g] = p
        outs.append(
            p.select(
                *keys_l, F.lit(g).alias("grain"),
                F.col("__bucket").alias("bucket_ts"),
                F.hll_sketch_estimate("__sk").alias(out_col),
                F.col("__n").alias("n_events"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
