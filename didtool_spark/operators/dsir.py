"""Data selection via importance resampling (DSIR) in a hashed n-gram
feature space — Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling" (NeurIPS). Selects raw-corpus documents
whose token statistics look like a small TARGET corpus:

  1. hash every unigram + bigram of both corpora into ``n_buckets``
     buckets (xxhash64 by default — JVM codegen, no digest per gram;
     ``hash_fn="md5_60"`` swaps in the portable 60-bit md5 prefix so a
     SQL engine can replay the bucketing exactly, the same
     engine-default/gate-replay split as text.winnow_fingerprints);
  2. estimate smoothed bucket probabilities p_target / p_raw;
  3. per raw doc, importance log-weight = sum over its gram
     occurrences of log(p_target[b] / p_raw[b]);
  4. resample without replacement via the Gumbel-top-k trick —
     perturb each log-weight with deterministic Gumbel noise and keep
     the top ``frac`` by perturbed score.

Scale notes (100 TB):
- The two fit scans shuffle only (bucket) with map-side combine; the
  result is a bounded ``n_buckets``-row table that broadcasts back, so
  scoring is explode -> broadcast-join -> one (doc_id, partial-sum)
  shuffle. Text never moves.
- The selection threshold is a quantile of the perturbed score:
  ``threshold="approx"`` (default) uses approx_percentile — a mergeable
  sketch, the only form that survives 10^9 docs; ``"exact"`` uses the
  exact interpolated percentile (single aggregation buffer holding all
  scores — gate/validation use only, same exact-vs-binned split as the
  AUC family).
- Everything is hash-derived and deterministic under any partitioning.

reference parity: didtool has no corpus selection; this is part of the
training-data-pipeline charter (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .decontam import _norm_tokens

__all__ = ["dsir_log_ratios", "dsir_scores", "importance_resample"]


def _bucket_expr(g: Column, n_buckets: int, hash_fn: str = "xxhash64") -> Column:
    """Bucket hash. ``xxhash64`` (default): whole-stage-codegen JVM
    hash, non-negative via pmod — the at-scale path (no md5 digest per
    gram). ``md5_60``: portable 60-bit md5 prefix mod n_buckets
    (DuckDB: ('0x' || substr(md5(g), 1, 15))::BIGINT % n_buckets) —
    gate/oracle replay only."""
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(g), F.lit(n_buckets)).cast("long")
    if hash_fn == "md5_60":
        return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long") % n_buckets
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def _gram_buckets(toks: Column, n_buckets: int, hash_fn: str = "xxhash64") -> Column:
    """Bucket ids of every unigram and bigram OCCURRENCE (multiset —
    DSIR features are counts, not presence)."""
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # zip_with pads the shorter side -> drop the dangling last element
    bigrams = F.slice(bigrams, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    grams = F.concat(toks, bigrams)
    return F.transform(grams, lambda g: _bucket_expr(g, n_buckets, hash_fn))


def _bucket_counts(
    df: DataFrame, col: str, n_buckets: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    toks = df.select(_norm_tokens(F.col(col)).alias("__toks"))
    return (
        toks.select(
            F.explode(_gram_buckets(F.col("__toks"), n_buckets, hash_fn)).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    col: str = "text",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(b, log_ratio) for every bucket observed in ``raw`` —
    log_ratio = ln p_target(b) - ln p_raw(b) with add-``alpha``
    smoothing (p(b) = (c_b + alpha) / (N + alpha * n_buckets)). Raw
    buckets suffice: every gram of a doc being scored is by definition
    in the raw counts. Bounded at n_buckets rows — broadcastable."""
    tc = _bucket_counts(target, col, n_buckets, hash_fn)
    rc = _bucket_counts(raw, col, n_buckets, hash_fn)
    tt = tc.agg(F.sum("c").alias("nt"))
    rt = rc.agg(F.sum("c").alias("nr"))
    a, b_ = float(alpha), float(alpha * n_buckets)
    return (
        rc.join(tc.withColumnRenamed("c", "ct"), "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "b",
            (
                F.log((F.coalesce("ct", F.lit(0)) + a) / (F.col("nt") + b_))
                - F.log((F.col("c") + a) / (F.col("nr") + b_))
            ).alias("log_ratio"),
        )
    )


def dsir_scores(
    raw: DataFrame,
    ratios: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-doc importance log-weight: explode the doc's gram buckets,
    broadcast-join the bounded ratio table, sum per doc (map-side
    partial aggregation; the shuffled unit is (id, double))."""
    sess = raw.sparkSession
    toks = raw.repartition(sess.sparkContext.defaultParallelism).select(
        F.col(id_col), _norm_tokens(F.col(col)).alias("__toks")
    )
    exploded = toks.select(
        F.col(id_col),
        F.explode(_gram_buckets(F.col("__toks"), n_buckets, hash_fn)).alias("b"),
    )
    return (
        exploded.join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(F.sum("log_ratio").alias("log_weight"))
    )


def importance_resample(
    raw: DataFrame,
    target: DataFrame,
    frac: float = 0.25,
    col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    seed: int = 0,
    threshold: str = "approx",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """DSIR selection: returns one row per RAW doc with ``log_weight``,
    ``keep`` (1 for the selected ~``frac`` of docs) — Gumbel-top-k
    resampling without replacement, deterministic via the portable md5
    uniform (per-DOC, so md5 cost is negligible; the per-GRAM bucket
    hash follows ``hash_fn``). ``threshold="approx"`` is the at-scale
    quantile (approx_percentile sketch); ``"exact"`` replays
    bit-comparably in ANSI SQL (gate/validation)."""
    if threshold not in ("approx", "exact"):
        raise ValueError(f"unknown threshold {threshold!r}")
    ratios = dsir_log_ratios(target, raw, col, n_buckets, alpha, hash_fn)
    scores = dsir_scores(raw, ratios, col, id_col, n_buckets, hash_fn)
    # deterministic Gumbel: u in (0,1) from the 60-bit md5 prefix
    # (+0.5 keeps u strictly inside the open interval — ln(0) differs
    # across engines)
    key = F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    u = (h % 1_000_000 + 0.5) / 1_000_000.0
    g = -F.log(-F.log(u))
    scored = scores.select(id_col, "log_weight", (F.col("log_weight") + g).alias("__s"))
    q = 1.0 - float(frac)
    thr_fn = "percentile" if threshold == "exact" else "approx_percentile"
    thr = scored.agg(F.expr(f"{thr_fn}(__s, {q!r})").alias("__thr"))
    return (
        scored.crossJoin(F.broadcast(thr))
        .select(
            id_col,
            "log_weight",
            (F.col("__s") >= F.col("__thr")).cast("int").alias("keep"),
        )
    )
