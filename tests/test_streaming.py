"""Streaming feature path: file-source micro-batch (availableNow) with
checkpointed incremental re-runs; session stats vs the batch engine."""

import os

import pytest
from pyspark.sql import functions as F

from didtool_spark.data.transcripts import generate_transcripts
from didtool_spark.operators.temporal import sessionize
from didtool_spark.streaming.stream import (
    read_transcript_stream,
    run_stream_once,
    streaming_session_stats,
    streaming_turn_features,
)

GAP = 1800


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "src")
    tr = generate_transcripts(spark, n_convs=30, avg_turns=10)
    tr.write.mode("overwrite").parquet(src)
    return src, str(root)


def test_streaming_turn_features(spark, stream_dirs):
    src, root = stream_dirs
    out = os.path.join(root, "feat_out")
    ck = os.path.join(root, "feat_ck")
    stream = read_transcript_stream(spark, src)
    assert stream.isStreaming
    run_stream_once(streaming_turn_features(stream), ck, out)
    got = spark.read.parquet(out)
    n = spark.read.parquet(src).count()
    assert got.count() == n
    assert "text_len" in got.columns and "is_tool" in got.columns

    # incremental: re-run with same checkpoint processes nothing new
    run_stream_once(streaming_turn_features(read_transcript_stream(spark, src)), ck, out)
    assert spark.read.parquet(out).count() == n


def test_streaming_session_stats_matches_batch(spark, stream_dirs):
    src, root = stream_dirs
    out = os.path.join(root, "sess_out")
    ck = os.path.join(root, "sess_ck")
    run_stream_once(
        streaming_session_stats(
            read_transcript_stream(spark, src), GAP, watermark="0 seconds"
        ),
        ck, out,
    )
    got = spark.read.parquet(out)

    src_df = spark.read.parquet(src)
    max_ts = src_df.select(F.max("ts")).first()[0]
    batch = sessionize(src_df, gap_seconds=GAP)
    batch_sessions = (
        batch.groupBy("conv_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        # append mode only emits sessions CLOSED at the final watermark
        # (session end + gap <= max event time); the still-open tail
        # session is correctly withheld by streaming semantics
        .where(
            F.col("session_end") + F.expr(f"INTERVAL {GAP} SECONDS")
            <= F.lit(max_ts)
        )
    )
    # same sessions: (conv, start, n_turns) triples
    a = (
        got.select("conv_id", "session_start", "n_turns")
        .toPandas()
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    b = (
        batch_sessions.select("conv_id", "session_start", "n_turns")
        .toPandas()
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_stateful_running_features(spark, stream_dirs, tmp_path_factory):
    """applyInPandasWithState: state must carry across micro-batches
    (maxFilesPerTrigger=1 forces several) and reproduce the batch
    cumulative features exactly."""
    from didtool_spark.streaming.stream import streaming_running_features

    src, _ = stream_dirs
    root = str(tmp_path_factory.mktemp("stateful"))
    out = os.path.join(root, "out")
    ck = os.path.join(root, "ck")

    stream = read_transcript_stream(spark, src, max_files_per_trigger=1)
    run_stream_once(streaming_running_features(stream, GAP), ck, out)
    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    batch_src = spark.read.parquet(src)
    from didtool_spark.operators.temporal import sessionize
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("ts", "turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    expect = (
        sessionize(batch_src, gap_seconds=GAP)
        .withColumn("turn_number", F.count(F.lit(1)).over(w))
        .withColumn("cum_text_len", F.sum(F.length("text")).over(w))
        .select("conv_id", "turn_idx", "turn_number", "cum_text_len", "session_id")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expect)
    assert (got["turn_number"].values == expect["turn_number"].values).all()
    assert (got["cum_text_len"].values == expect["cum_text_len"].values).all()
    assert (got["session_id"].values == expect["session_id"].values).all()


def test_streaming_exact_dedup(spark, tmp_path_factory):
    """Duplicated texts within the watermark horizon are emitted once;
    the survivor set matches the batch exact-dedup canonical set."""
    from didtool_spark.operators.dedup import exact_dupes
    from didtool_spark.streaming.stream import streaming_exact_dedup

    root = tmp_path_factory.mktemp("sdedup")
    src, out, ck = str(root / "src"), str(root / "out"), str(root / "ck")
    tr = generate_transcripts(spark, n_convs=10, avg_turns=8)
    # plant duplicates: every text appears twice under different ids
    dup = tr.withColumn("turn_idx", F.col("turn_idx") + 1000)
    tr.unionByName(dup).write.mode("overwrite").parquet(src)

    run_stream_once(
        streaming_exact_dedup(read_transcript_stream(spark, src), watermark="0 seconds"),
        ck, out,
    )
    got = spark.read.parquet(out)
    batch = spark.read.parquet(src)
    n_distinct = batch.select(
        F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    ).distinct().count()
    assert got.count() == n_distinct
    # batch path agrees on the number of canonical survivors
    b = exact_dupes(
        batch.withColumn("doc_id", F.monotonically_increasing_id()),
        "text", "doc_id",
    )
    assert b.where(F.col("is_dup") == 0).count() == n_distinct
