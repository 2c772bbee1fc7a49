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
