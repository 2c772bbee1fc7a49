"""Training-data curation operators: PII scrubbing, document chunking,
stratified sampling, and sequence packing.

These extend the reference's feature-engineering surface with the
dataset-preparation steps a large-scale LLM training pipeline needs
(SURVEY.md §2.10 charter). Every operator is pure ``pyspark.sql``
expressions — whole-stage codegen, no Python in the row path — and
deterministic (hash-derived randomness), so each has an exact DuckDB
oracle at the driver gate.

Scale notes:
- scrub_pii / chunk_documents are embarrassingly parallel (per-row
  expressions; chunking explodes rows but never shuffles).
- stratified_sample is a per-row hash test — no sampling shuffle, no
  driver state, reproducible across any cluster size (unlike
  ``DataFrame.sample``, whose output depends on partitioning).
- pack_sequences packs within hash shards: the only window runs per
  shard, so no global ordering / single-task stage; shard count is the
  parallelism knob.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "PII_PATTERNS",
    "scrub_pii",
    "chunk_documents",
    "stratified_sample",
    "pack_sequences",
    "length_bucket_stats",
]

# Ordered: URLs scrub first so an email-looking userinfo inside a URL is
# consumed by [URL], then emails, then bare IPv4s, then phone-ish runs.
# Patterns avoid lookaround/backreferences so the Java regex engine
# (Spark) and RE2 (DuckDB oracle) agree.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "[URL]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "[PHONE]"),
]


def scrub_pii(
    df: DataFrame,
    col: str,
    out_col: str | None = None,
    kinds: Sequence[str] | None = None,
) -> DataFrame:
    """Redact PII-looking spans and count them per kind.

    Adds ``{out_col}`` (scrubbed text) and one ``n_{kind}`` count per
    pattern. Counts are taken on the PROGRESSIVELY scrubbed text (an
    email inside a URL counts once, as a URL) — the same sequential
    semantics the oracle replays."""
    out_col = out_col or f"{col}_scrubbed"
    wanted = [p for p in PII_PATTERNS if kinds is None or p[0] in kinds]
    cur: Column = F.col(col)
    out = df
    for kind, pat, repl in wanted:
        out = out.withColumn(f"n_{kind}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn(out_col, cur)


def chunk_documents(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping whitespace-token windows:
    starts at 0, stride ``chunk_tokens - overlap``; the tail chunk may
    be short. Returns (id, chunk_id, chunk_text, n_tokens) — one
    explode, no shuffle; the standard context-window preparation step."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    tk = F.split(F.trim(F.col(col)), r"\s+")
    base = df.select(
        F.col(id_col),
        tk.alias("__tk"),
        F.greatest(F.size(tk), F.lit(1)).alias("__n"),
    )
    starts = F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
    chunks = base.select(
        id_col,
        "__tk",
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    piece = F.slice(F.col("__tk"), F.col("__start") + 1, chunk_tokens)
    return chunks.select(
        id_col,
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def _hash_unit(col: Column, seed: int, mod: int = 1_000_000) -> Column:
    """Uniform [0, 1) from a 60-bit md5 hash — portable across engines
    (DuckDB: ('0x' || substr(md5(v || '|' || seed), 1, 15))::BIGINT)."""
    key = F.concat(col.cast("string"), F.lit(f"|{seed}"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return (h % mod) / float(mod)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: keep a row iff
    hash_unit(id, seed) < fractions[stratum]. Reproducible on any
    cluster size and under any repartitioning (``DataFrame.sample`` is
    neither); exact fractions in expectation. Strata absent from
    ``fractions`` keep ``default_fraction``."""
    from ..functions.exprs import map_expr

    frac = map_expr(F.col(strata_col), dict(fractions), default=default_fraction)
    return df.where(_hash_unit(F.col(id_col), seed) < frac)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (sequence packing
    for pretraining batches): documents are placed in a deterministic
    hash order and cut into packs by cumulative token quota —
    ``pack_no = floor(exclusive_cumsum(tokens) / budget)``.

    Quota packing, not exact greedy first-fit: a pack can overrun by
    one document's tail (exact greedy needs a sequential reset-on-
    overflow scan that cannot parallelize). Packing runs independently
    per hash shard, so the window never sees more than ~1/n_shards of
    the data — pack identity is (shard, pack_no)."""
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))), 1, 15),
            16,
            10,
        ).cast("long")
        % n_shards
    ).cast("int")
    tagged = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(F.col(token_col).cast("long")).over(w), F.lit(0))
    return tagged.withColumn(
        "pack_no", F.floor(cum / F.lit(int(budget))).cast("int")
    )


def pack_conversations(
    turns: DataFrame,
    token_col: str,
    conv_col: str = "conv_id",
    budget: int = 2048,
    n_shards: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Conversation-boundary-respecting sequence packing: whole
    conversations are assigned to fixed-token-budget packs — a
    conversation is NEVER split across packs (splitting one severs the
    dialogue context the pack exists to train on). The unit being
    packed is the per-conversation token total; the pack id then joins
    back to every turn.

    Same quota rule and scale shape as ``pack_sequences`` (hash-shard
    -> exclusive-cumsum window -> floor(cum/budget)), plus one
    aggregation to build the conversation totals and one equi-join to
    fan the pack id back out. The join key is the conversation id, so
    AQE broadcasts the (bounded: one row per conversation) pack table
    when it fits and degrades to a shuffled equi-join when it does not.
    A conversation longer than ``budget`` still lands in exactly one
    pack (flagged ``oversize`` for the caller to truncate or drop).

    Output: the input turns plus (shard, pack_no, conv_tokens,
    oversize).
    """
    totals = turns.groupBy(conv_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("conv_tokens")
    )
    packed = pack_sequences(
        totals, "conv_tokens", id_col=conv_col, budget=budget,
        n_shards=n_shards, seed=seed,
    ).withColumn("oversize", F.col("conv_tokens") > F.lit(int(budget)))
    return turns.join(packed, conv_col)


def length_bucket_stats(
    df: DataFrame,
    token_count_col: str,
    min_bucket: int = 16,
    max_bucket: int = 8192,
) -> DataFrame:
    """Sequence-length bucketing report for batch shaping: assign each
    document to the smallest power-of-two bucket >= its token count
    (clamped to [min_bucket, max_bucket]; longer docs land in the top
    bucket, to be chunked upstream) and report, per bucket, document
    count, real token mass, padded token mass (n_docs * bucket) and
    the padding-waste fraction — the number that decides whether a
    trainer pads to fixed length or buckets by length.

    Plan: bucket id is a per-row expression (ceil-log2 via
    ``ceil(log2(n))``), then ONE map-side-combined groupBy over at most
    ``log2(max/min)+1`` distinct keys — the shuffle carries a dozen
    rows per map task. The final sort orders a dozen-row result.
    """
    n = F.greatest(F.col(token_count_col).cast("long"), F.lit(1))
    raw = F.pow(F.lit(2.0), F.ceil(F.log2(n)).cast("double"))
    bucket = F.least(
        F.greatest(raw.cast("long"), F.lit(int(min_bucket))),
        F.lit(int(max_bucket)),
    )
    out = (
        df.select(
            bucket.alias("bucket"),
            F.col(token_count_col).cast("long").alias("__n"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("sum_tokens"),
        )
        .withColumn("padded_tokens", F.col("n_docs") * F.col("bucket"))
        .withColumn(
            "waste_frac",
            F.round(
                1.0 - F.col("sum_tokens") / F.col("padded_tokens").cast("double"),
                6,
            ),
        )
    )
    return out.orderBy("bucket")
