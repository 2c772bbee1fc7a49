"""Structured Streaming ingestion of transcript turns: the same
feature semantics as the batch engine, expressed as a streaming plan.

- stateless per-turn features: identical column expressions
  (plans.materialize.turn_features) — stream/batch parity for free;
- sessionization: ``session_window(ts, gap)`` — Spark's native gap-based
  session assignment with watermark-driven state eviction (the batch
  cumulative-sum session id enumerates sessions; the streaming form
  keys them by window start — equivalent partitioning of events, ids
  differ by representation, documented);
- per-session aggregates via the session window groupBy;
- custom stateful operators would use applyInPandasWithState — not
  needed for the session/rolling set here.

Batch tests drive these plans with a file source + one micro-batch
(availableNow) — no always-on cluster in the sandbox; the same code
runs against Kafka by swapping the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.materialize import turn_features

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_DDL).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def streaming_turn_features(stream: DataFrame) -> DataFrame:
    """Stateless per-turn features — same exprs as batch."""
    return turn_features(stream).drop("text")


def streaming_session_stats(
    stream: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Per (conv_id, session) aggregates with late-data handling:
    watermark bounds state; session_window merges events within the gap."""
    return (
        turn_features(stream)
        .withWatermark("ts", watermark)
        .groupBy(
            F.col("conv_id"),
            F.session_window("ts", f"{gap_seconds} seconds").alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("text_len").alias("text_len_sum"),
            F.sum("is_tool").alias("n_tool_turns"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "conv_id",
            F.col("session.start").alias("window_start"),
            F.col("session.end").alias("window_end"),
            "n_turns",
            "text_len_sum",
            "n_tool_turns",
            "session_start",
            "session_end",
        )
    )


def run_stream_once(
    df: DataFrame, checkpoint_dir: str, out_dir: str, out_format: str = "parquet"
) -> None:
    """Drain all available input in one availableNow trigger (test/batch
    backfill mode); checkpoint makes re-runs incremental."""
    mode = "append"
    q = (
        df.writeStream.format(out_format)
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_running_features(
    stream: DataFrame,
    gap_seconds: int = 1800,
):
    """Custom stateful operator via applyInPandasWithState: per-conv
    running counters that survive micro-batch boundaries — cumulative
    turn number, cumulative text length, and the session id continued
    from state (the streaming form of the batch cumulative-sum
    sessionize, exact same ids).

    State per conv_id: (n_turns, cum_text_len, last_ts_epoch,
    session_id). Late/out-of-order data within a micro-batch is ordered
    by (ts, turn_idx); cross-batch ordering relies on the source being
    append-ordered per conversation (true for transcript logs).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", LongType()),
            StructField("ts", TimestampType()),
            StructField("turn_number", LongType()),
            StructField("cum_text_len", LongType()),
            StructField("session_id", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_turns", LongType()),
            StructField("cum_text_len", LongType()),
            StructField("last_ts_epoch", LongType()),
            StructField("session_id", LongType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        if state.exists:
            n_turns, cum_len, last_ts, session_id = state.get
        else:
            n_turns, cum_len, last_ts, session_id = 0, 0, None, -1
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            for row in pdf.itertuples(index=False):
                ep = int(pd.Timestamp(row.ts).value // 1_000_000_000)
                if last_ts is None or ep - last_ts > gap_seconds:
                    session_id += 1
                last_ts = ep
                n_turns += 1
                cum_len += len(row.text or "")
                out.append(
                    (conv_id, int(row.turn_idx), row.ts, n_turns, cum_len, session_id)
                )
        state.update((n_turns, cum_len, last_ts, session_id))
        yield pd.DataFrame(
            out,
            columns=[
                "conv_id", "turn_idx", "ts", "turn_number", "cum_text_len",
                "session_id",
            ],
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_near_dup_matches(
    stream: DataFrame,
    index,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    threshold: float = 0.6,
    watermark: str = "1 hour",
) -> DataFrame:
    """Incremental near-dup check of a document stream against a static
    reference corpus (the crawl-dedup pattern: is this incoming page a
    near-copy of anything already ingested?).

    ``index`` is a dedup.NearDupIndex — the banding parameters ride
    WITH the index (re-specifying them here and getting them wrong
    would silently match nothing), and the SAME banding/shingle
    expressions are used, so stream and batch agree on candidates.
    Plan per micro-batch, all stream-static stateless:
    shingle + sign the incoming docs (JVM expressions), posexplode
    band/bucket, equi-join the band index (candidate generation — the
    only join that touches the corpus-sized side), join the candidates'
    shingles, exact-Jaccard verify, and dropDuplicatesWithinWatermark
    on (doc_id, matched_id) to collapse multi-band hits with
    watermark-bounded state. Emits (doc_id, ts, matched_id, jaccard >=
    threshold).

    At scale the band index is bucketed/partitioned by (band, bucket)
    so each micro-batch join prunes to the buckets it touches; state is
    only the recent pair-keys horizon, never the corpus."""
    from ..operators.dedup import (
        band_buckets_expr, base_hash_expr, jaccard_expr, minhash_expr,
        shingles_expr,
    )

    s = stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts"),
        shingles_expr(F.col(text_col), index.k_shingle).alias("__sh"),
    )
    s = s.withColumn("__hs", base_hash_expr(F.col("__sh"))).withColumn(
        "__sig", minhash_expr(F.col("__hs"), index.n_hashes)
    )
    s_banded = s.select(
        "doc_id", "ts", "__sh",
        F.explode(
            band_buckets_expr(F.col("__sig"), index.n_hashes, index.bands)
        ).alias("bb"),
    ).select(
        "doc_id", "ts", "__sh",
        F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"),
    )
    cands = s_banded.join(
        index.bands_df.withColumnRenamed("id", "matched_id"), ["band", "bucket"]
    ).select("doc_id", "ts", "__sh", "matched_id")
    verified = (
        cands.join(
            index.shingles_df.select(
                F.col("id").alias("matched_id"), F.col("sh").alias("__msh")
            ),
            "matched_id",
        )
        .withColumn("jaccard", jaccard_expr(F.col("__sh"), F.col("__msh")))
        .where(F.col("jaccard") >= threshold)
    )
    return (
        verified.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["doc_id", "matched_id"])
        .select("doc_id", "ts", "matched_id", F.round("jaccard", 6).alias("jaccard"))
    )


def streaming_decayed_features(
    stream: DataFrame,
    half_life_s: float = 3600.0,
):
    """Streaming form of operators.ts_features.with_decayed: per-conv
    exponentially time-decayed text-length sum and turn count, emitted
    STRICTLY HISTORICALLY (the row's own turn is excluded, matching the
    batch include_current=False default — leakage-safe).

    State per conv_id is three scalars (last_ts_micros, decayed_sum,
    decayed_count): each arriving turn decays the state by
    ``exp(-ln2 * dt / half_life)`` (sequential products of factors
    <= 1 — unconditionally stable, no overflow bound at all, unlike the
    batch window strategy's rebase), emits the decayed values, then
    folds its own (text_len, 1) in.  First-ever turn of a conv emits
    NULL (batch: sum over an empty frame).

    Ordering caveat shared with streaming_running_features: rows are
    sorted (ts, turn_idx) within a micro-batch; cross-batch order
    relies on the source being append-ordered per conversation.
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
        TimestampType,
    )

    lam = math.log(2.0) / float(half_life_s)
    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", LongType()),
            StructField("ts", TimestampType()),
            StructField("text_len_decsum", DoubleType()),
            StructField("turn_deccount", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_us", LongType()),
            StructField("dsum", DoubleType()),
            StructField("dcnt", DoubleType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        if state.exists:
            last_us, dsum, dcnt = state.get
        else:
            last_us, dsum, dcnt = None, 0.0, 0.0
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            for row in pdf.itertuples(index=False):
                us = int(pd.Timestamp(row.ts).value // 1_000)
                if last_us is None:
                    emit_sum = emit_cnt = None
                else:
                    decay = math.exp(-lam * (us - last_us) / 1e6)
                    dsum *= decay
                    dcnt *= decay
                    emit_sum, emit_cnt = dsum, dcnt
                dsum += float(len(row.text or ""))
                dcnt += 1.0
                last_us = us
                out.append(
                    (conv_id, int(row.turn_idx), row.ts, emit_sum, emit_cnt)
                )
        state.update((last_us, dsum, dcnt))
        pdf_out = pd.DataFrame(
            out,
            columns=[
                "conv_id", "turn_idx", "ts", "text_len_decsum",
                "turn_deccount",
            ],
        )
        yield pdf_out

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop turns whose normalized-text hash was
    already seen within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — state is evicted once the hash
    is older than the watermark, so state size is bounded by the
    dedup-window arrival rate, not the stream's history). The batch
    counterpart is dedup.exact_dupes; the same md5-of-normalized-text
    key keeps the two paths consistent."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return (
        stream.withColumn("__h", F.md5(norm))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__h"])
        .drop("__h")
    )


def streaming_transitions(
    stream: DataFrame,
    col: str = "role",
):
    """Streaming form of operators.seq_features.transition_counts: per
    conversation, emit the (from, to) state transition each arriving
    turn completes.  Downstream this feeds any streaming aggregation
    (e.g. groupBy(from, to).count() for live Markov matrices).

    State per conv_id is ONE value — the previous turn's ``col`` (with
    an explicit seen-flag so a NULL value is a real level, exactly the
    batch operator's contract).  The first turn of a conversation
    starts no transition and emits nothing.

    Ordering caveat shared with streaming_running_features: rows are
    sorted (ts, turn_idx) within a micro-batch; cross-batch order
    relies on the source being append-ordered per conversation.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", LongType()),
            StructField("ts", TimestampType()),
            StructField("from", StringType()),
            StructField("to", StringType()),
        ]
    )
    state_schema = StructType(
        [StructField("seen", BooleanType()), StructField("prev", StringType())]
    )

    def update(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        seen, prev = state.get if state.exists else (False, None)
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            for row in pdf.itertuples(index=False):
                cur = getattr(row, col)
                cur = None if pd.isna(cur) else cur
                if seen:
                    out.append(
                        (conv_id, int(row.turn_idx), row.ts, prev, cur)
                    )
                seen, prev = True, cur
        state.update((seen, prev))
        yield pd.DataFrame(
            out, columns=["conv_id", "turn_idx", "ts", "from", "to"]
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_funnel(
    stream: DataFrame,
    col: str,
    step_values: list,
    horizon_s: int | None = None,
):
    """Streaming form of operators.funnel.funnel for the common
    "ordered values of one column" case (e.g. event/role sequence
    tool_call -> tool_result -> resolution): per conversation, emit a
    row each time the funnel DEEPENS — ``(conv_id, ts, step, depth)``
    — so downstream live dashboards aggregate depth transitions
    without reprocessing history.

    State per conv_id is the completed steps' epoch seconds (at most
    ``len(step_values)`` longs).  Semantics mirror the batch operator
    exactly: each step takes its earliest in-order completion, a
    single row satisfies at most one step (the scan only ever tests
    the NEXT needed step), and ``horizon_s`` bounds steps 2..k to
    within that many seconds of the step-1 completion.  Parity with
    batch funnel() is asserted in tests/test_streaming.py.

    Ordering caveat shared with streaming_transitions: rows sort
    (ts, turn_idx) within a micro-batch; cross-batch order relies on
    the source being append-ordered per conversation.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField,
        StructType, TimestampType,
    )

    k = len(step_values)
    if k == 0:
        raise ValueError("step_values must be non-empty")

    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("step", StringType()),
            StructField("depth", IntegerType()),
        ]
    )
    state_schema = StructType(
        [StructField("completed", ArrayType(LongType()))]
    )

    def update(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        (completed,) = state.get if state.exists else ([],)
        completed = list(completed)
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            for row in pdf.itertuples(index=False):
                if len(completed) >= k:
                    break
                cur = getattr(row, col)
                if pd.isna(cur):
                    continue
                target = step_values[len(completed)]
                ep = int(pd.Timestamp(row.ts).value // 1_000_000_000)
                if cur == target and (
                    horizon_s is None
                    or not completed
                    or ep <= completed[0] + int(horizon_s)
                ):
                    completed.append(ep)
                    out.append(
                        (conv_id, row.ts, str(target), len(completed))
                    )
        state.update((completed,))
        yield pd.DataFrame(out, columns=["conv_id", "ts", "step", "depth"])

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_snapshot(stream: DataFrame):
    """Streaming CDC snapshot compaction — the live form of
    operators.scd.snapshot_latest: per (conv_id, role), keep the
    record that is latest under (ts, turn_idx) and emit it whenever it
    CHANGES.  The output is an upsert change stream; the most recent
    emission per key (max by (ts, turn_idx) of the emitted rows) is
    exactly the batch snapshot at drain time (asserted in
    tests/test_streaming.py).

    State per key is ONE row — the current latest — so state size is
    bounded by key cardinality, never by stream length; out-of-order
    arrivals older than the held latest emit nothing (the batch
    operator would have discarded them too).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("role", StringType()),
            StructField("turn_idx", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ts_us", LongType()),
            StructField("turn_idx", LongType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        conv_id, role = key
        if state.exists:
            best_us, best_idx, best_text, best_tool = state.get
        else:
            best_us, best_idx, best_text, best_tool = None, None, None, None
        changed = False
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            row = pdf.iloc[-1]
            us = int(pd.Timestamp(row["ts"]).value // 1_000)
            idx = int(row["turn_idx"])
            if best_us is None or (us, idx) > (best_us, best_idx):
                best_us, best_idx = us, idx
                best_text = None if pd.isna(row["text"]) else str(row["text"])
                best_tool = None if pd.isna(row["tool"]) else str(row["tool"])
                changed = True
        state.update((best_us, best_idx, best_text, best_tool))
        if changed:
            yield pd.DataFrame(
                [
                    (
                        conv_id,
                        role,
                        best_idx,
                        pd.Timestamp(best_us * 1_000),
                        best_text,
                        best_tool,
                    )
                ],
                columns=["conv_id", "role", "turn_idx", "ts", "text", "tool"],
            )
        else:
            yield pd.DataFrame(
                columns=["conv_id", "role", "turn_idx", "ts", "text", "tool"]
            )

    return stream.groupBy("conv_id", "role").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cms(
    stream: DataFrame,
    item_col: str,
    width: int = 256,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Count-min sketch over a stream — LITERALLY the batch build
    (operators.sketches.cms_build) applied to a streaming frame: the
    sketch is a groupBy(j, bucket) aggregation, and CMS mergeability
    is exactly what Spark's incremental streaming aggregation state
    does between micro-batches.  Run it with outputMode
    complete/update; the state is bounded at depth x width counters
    regardless of item cardinality — no watermark needed.
    """
    from ..operators.sketches import _cms_bucket

    item = F.col(item_col)
    cells = stream.where(item.isNotNull()).select(
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
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
