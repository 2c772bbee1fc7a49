"""Skew evidence: one conversation holding ~half of all turns (the
hot-key regime the north rule's salted-key splitting targets).

Compares wall time of the as-of join window strategy (whole hot key in
one task) vs the bucketed skew-splitting strategy, and sessionize
window vs bucketed (carry trick). Appends results to BENCH/SKEW.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from didtool_spark.data.transcripts import generate_transcripts
from didtool_spark.operators.temporal import (
    asof_join,
    forward_fill,
    sessionize,
    with_lags,
    with_rolling,
)
from didtool_spark.session import get_spark


def timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    hot_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    spark = get_spark("skew-bench", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    spark.sparkContext.setLogLevel("ERROR")

    tr = generate_transcripts(
        spark, n_convs=n_convs, avg_turns=50, n_hot=1, hot_factor=hot_factor
    )
    tr.write.mode("overwrite").parquet("/dev/shm/skew_input")
    tr = spark.read.parquet("/dev/shm/skew_input")
    n = tr.count()
    hot = tr.groupBy("conv_id").count().orderBy(F.desc("count")).first()
    print(f"turns={n}, hottest conv={hot['count']} ({100*hot['count']/n:.0f}%)")

    anchors = tr.where(F.col("role") == "user").select("conv_id", "turn_idx", "ts")
    feats = tr.where(F.col("role") == "tool").select(
        "conv_id", "ts", F.length("text").cast("double").alias("score")
    )

    def run_asof(strategy):
        asof_join(
            anchors, feats, keys="conv_id", value_cols=["score"],
            strategy=strategy, n_buckets=64,
        ).write.format("noop").mode("overwrite").save()

    def run_sess(strategy):
        sessionize(tr, strategy=strategy, bucket_seconds=6 * 3600).write.format(
            "noop"
        ).mode("overwrite").save()

    feat = tr.withColumn("text_len", F.length("text"))
    BW = 6 * 3600

    def run_lags(strategy):
        with_lags(
            feat, ["text_len"], lags=[1, 3], leads=[1],
            strategy=strategy, bucket_seconds=BW,
        ).write.format("noop").mode("overwrite").save()

    def run_roll_rows(strategy):
        with_rolling(
            feat, [("text_len", "sum", 5), ("text_len", "avg", 5)],
            strategy=strategy, bucket_seconds=BW,
        ).write.format("noop").mode("overwrite").save()

    def run_roll_time(strategy):
        with_rolling(
            feat, [("text_len", "sum", 1800)], ts_col="ts",
            strategy=strategy, bucket_seconds=BW,
        ).write.format("noop").mode("overwrite").save()

    def run_ffill(strategy):
        forward_fill(
            tr, ["tool"], strategy=strategy, bucket_seconds=BW
        ).write.format("noop").mode("overwrite").save()

    runners = {
        "asof": run_asof,
        "sessionize": run_sess,
        "lags": run_lags,
        "rolling_rows": run_roll_rows,
        "rolling_time": run_roll_time,
        "ffill": run_ffill,
    }
    # warm both plans once
    for fn in runners.values():
        for s in ("window", "bucketed"):
            fn(s)

    results = {}
    for name, fn in runners.items():
        for s in ("window", "bucketed"):
            results[f"{name}_{s}"] = timed(lambda fn=fn, s=s: fn(s))
    print(results)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SKEW.md", "w") as f:
        f.write(
            f"""# BENCH/SKEW — hot-key skew-splitting evidence

Input: {n:,} turns, hottest conversation holds {hot['count']:,}
({100 * hot['count'] / n:.0f}% of all turns) — the regime where
``Window.partitionBy(conv_id)`` serializes on one task.

| operator | window strategy (s) | bucketed skew-split (s) |
|---|---|---|
| as-of join | {results['asof_window']} | {results['asof_bucketed']} |
| sessionize | {results['sessionize_window']} | {results['sessionize_bucketed']} |
| lag/lead (x3) | {results['lags_window']} | {results['lags_bucketed']} |
| rolling rows (sum+avg last5) | {results['rolling_rows_window']} | {results['rolling_rows_bucketed']} |
| rolling time (sum 1800s) | {results['rolling_time_window']} | {results['rolling_time_bucketed']} |
| forward fill | {results['ffill_window']} | {results['ffill_bucketed']} |

All bucketed forms are proven output-identical to the window forms
(tests/test_temporal.py). At 10^12 turns a hot conversation makes the
window strategy's single task unbounded; the bucketed strategies bound
every task by the time-bucket width regardless of key size.
"""
        )


if __name__ == "__main__":
    main()
