"""Single-node pandas baseline vs the Spark engine at the same data
scale — evidence for the 'matches-or-beats the reference's single-node
throughput' goal.

The reference itself cannot run in this container (didtool imports
sklearn/lightgbm/scipy/matplotlib at module level; none are installed —
see BASELINE.md), so the baseline is BEST-PRACTICE vectorized pandas
(sort + groupby transform/cumsum/rolling — not a strawman groupby.apply
loop), which is strictly faster than the reference's Pool-of-
groupby.apply shape for these ops.

Writes BENCH/SINGLE_NODE.md and prints one JSON line.

Usage: python scripts/single_node_bench.py [n_convs] [avg_turns]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GAP_S = 1800


def pandas_materialize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized single-node equivalent of
    plans.materialize.materialize_features — the SAME feature columns:
    6 turn features, sessionize, 4 lags, 5 strictly-trailing rollings,
    1 forward-fill."""
    df = pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").copy()
    df["text_len"] = df["text"].str.len()
    df["n_tokens"] = df["text"].str.count(" ") + 1
    df["is_user"] = (df["role"] == "user").astype("int32")
    df["is_assistant"] = (df["role"] == "assistant").astype("int32")
    df["is_tool"] = (df["role"] == "tool").astype("int32")
    df["has_tool"] = df["tool"].notna().astype("int32")
    g = df.groupby("conv_id", sort=False)
    gap = g["ts"].diff().dt.total_seconds()
    df["session_id"] = (
        (gap.isna() | (gap > GAP_S)).astype("int64").groupby(df["conv_id"]).cumsum() - 1
    )
    for col in ("text_len", "n_tokens"):
        for lag in (1, 2):
            df[f"{col}_lag{lag}"] = g[col].shift(lag)
    for col, agg, k in (
        ("text_len", "sum", 5),
        ("text_len", "mean", 5),
        ("n_tokens", "sum", 5),
        ("is_tool", "sum", 10),
        ("is_user", "sum", 10),
    ):
        shifted = g[col].shift(1)
        df[f"{col}_{agg}_last{k}"] = (
            shifted.groupby(df["conv_id"])
            .rolling(k, min_periods=1)
            .agg(agg)
            .reset_index(level=0, drop=True)
        )
    df["tool_ffill"] = g["tool"].ffill()
    return df.drop(columns=["text", "role"])


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    avg_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    from didtool_spark.session import get_spark
    from didtool_spark.data.transcripts import generate_transcripts
    from didtool_spark.plans.materialize import materialize_features

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("single-node-bench", cores=cpus, shuffle_partitions=cpus)
    tr = generate_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns)

    # stage to parquet so both sides read the same bytes
    stage = "/dev/shm/sn_bench_transcripts"
    tr.write.mode("overwrite").parquet(stage)
    src = spark.read.parquet(stage)
    n_turns = src.count()

    # Spark side (warm pass then timed, noop sink so everything
    # materializes)
    feats = materialize_features(src)
    feats.write.format("noop").mode("overwrite").save()
    t0 = time.time()
    materialize_features(src).write.format("noop").mode("overwrite").save()
    spark_sec = time.time() - t0

    # pandas side: read the same parquet, same columns, timed end to end
    # (a single-node job must also pay the scan)
    t0 = time.time()
    pdf = pd.read_parquet(
        stage, columns=["conv_id", "turn_idx", "role", "ts", "text", "tool"]
    )
    out = pandas_materialize(pdf)
    # touch the results so lazy blocks materialize
    checksum = float(out["text_len_sum_last5"].fillna(0).sum())
    pandas_sec = time.time() - t0

    result = {
        "metric": "single_node_vs_spark_materialize",
        "n_turns": n_turns,
        "spark_sec": round(spark_sec, 2),
        "spark_turns_per_sec": round(n_turns / spark_sec, 1),
        "pandas_sec": round(pandas_sec, 2),
        "pandas_turns_per_sec": round(n_turns / pandas_sec, 1),
        "speedup": round(pandas_sec / spark_sec, 2),
        "cpus": cpus,
        "pandas_checksum": checksum,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SINGLE_NODE.md", "w") as f:
        f.write(
            "# BENCH/SINGLE_NODE — single-node pandas baseline vs the engine\n\n"
            "Goal evidence: 'matches-or-beats the reference's single-node\n"
            "throughput at the same data scale'. The reference cannot run in\n"
            "this container (module-level sklearn/lightgbm/scipy/matplotlib\n"
            "imports; see BASELINE.md), so the baseline is best-practice\n"
            "VECTORIZED pandas (sort + groupby cumsum/rolling/shift/ffill —\n"
            "stronger than the reference's Pool + groupby.apply shape) doing\n"
            "the same sessionize + lag + trailing-rolling + forward-fill\n"
            "pipeline over the same staged parquet.\n\n"
            "| metric | value |\n|---|---|\n"
            f"| input turns | {n_turns:,} |\n"
            f"| pandas (1 core, vectorized) | {result['pandas_sec']}s "
            f"({result['pandas_turns_per_sec']:,.0f} turns/s) |\n"
            f"| didtool_spark local[{cpus}] | {result['spark_sec']}s "
            f"({result['spark_turns_per_sec']:,.0f} turns/s) |\n"
            f"| speedup | **{result['speedup']}x** |\n\n"
            "Both sides read the identical staged parquet and materialize the\n"
            "same feature columns; Spark timing is a steady-state (post-JIT)\n"
            "pass with the noop sink.\n"
        )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
