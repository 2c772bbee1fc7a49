"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No multi-node cluster exists in this sandbox, so the job runs under
``local-cluster[N, cores, mem]`` — Spark's test-grade standalone mode
that spawns REAL separate executor JVMs on this machine — at N and 4N
executors. That is materially closer to the north rule than local[k]
threads: each executor has its own heap/GC and the shuffle crosses
process boundaries.

Each level runs in a fresh subprocess on the SAME deterministic
synthetic transcript input staged to parquet on tmpfs (the virtio disk
serializes concurrent I/O and would measure the device, not the job).
A small warm-up run excludes one-off codegen compilation from the
timing. Writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_convs] [n_exec_low] [n_exec_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORES_PER_EXEC = 2
EXEC_MEM_MB = 6144

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from didtool_spark.plans.materialize import run_throughput

n_exec = {n_exec}
total_cores = n_exec * {cpe}
spark = (
    SparkSession.builder
    .master("local-cluster[{n_exec},{cpe},{mem}]")
    .appName("scaling-{n_exec}x")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.shuffle.partitions", str(2 * total_cores))
    .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    .config("spark.local.dir", "/dev/shm/spark-scratch")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
# steady-state throughput: one untimed warm pass over the full input
# fully C2-JITs the codegen'd hot paths, then the second pass is timed
# (a cold pass is interpreter-bound and understates high-parallelism
# throughput)
res = run_throughput(spark, n_convs={n_convs}, avg_turns=50,
                     stage_path="/dev/shm/scaling_input_{n_convs}",
                     warm_passes=1, timed_passes=3)
print("RESULT " + json.dumps(res))
spark.stop()
"""


def run_level(n_exec: int, n_convs: int) -> dict:
    code = CHILD.format(
        repo=REPO, n_exec=n_exec, n_convs=n_convs, cpe=CORES_PER_EXEC, mem=EXEC_MEM_MB
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"level {n_exec} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    r_low = run_level(low, n_convs)
    r_high = run_level(high, n_convs)
    factor = high / low
    eff = r_high["turns_per_sec"] / (factor * r_low["turns_per_sec"])
    report = {
        "n_turns": r_low["n_turns"],
        "low_executors": low,
        "high_executors": high,
        "cores_per_executor": CORES_PER_EXEC,
        "low_turns_per_sec": round(r_low["turns_per_sec"], 1),
        "high_turns_per_sec": round(r_high["turns_per_sec"], 1),
        "low_sec": round(r_low["sec"], 2),
        "high_sec": round(r_high["sec"], 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — N vs 4N executor scaling evidence

Per the north rule's two-cluster-size criterion (no multi-node cluster
in this sandbox): the identical feature-materialization job
(`didtool_spark.plans.materialize.materialize_features` — sessionize +
lag/lead + bounded rolling + forward-fill + text features, noop sink so
every column materializes) over the same deterministic synthetic
transcript input, under `local-cluster[N,{CORES_PER_EXEC},{EXEC_MEM_MB}]`
— real separate executor JVMs — at N={low} and 4N={high} executors,
`spark.sql.shuffle.partitions` scaled with total cores (2x), executor
size fixed — the scale-out shape of a real N -> 4N cluster growth.

| metric | value |
|---|---|
| input turns | {report['n_turns']:,} |
| N = {low} executors x {CORES_PER_EXEC} cores | {report['low_turns_per_sec']:,.0f} turns/sec ({report['low_sec']}s) |
| 4N = {high} executors x {CORES_PER_EXEC} cores | {report['high_turns_per_sec']:,.0f} turns/sec ({report['high_sec']}s) |
| scaling efficiency = thr(4N) / (4 x thr(N)) | **{report['scaling_efficiency']}** |
| target | >= 0.8 |

Method notes:
- input generated Spark-side from seeded xxhash64 expressions
  (didtool_spark/data/transcripts.py) — bit-identical at any
  parallelism — staged to parquet on tmpfs and counted before the
  timed section, so the measurement is the read -> shuffle -> window
  materialization only;
- scratch dirs on tmpfs: the sandbox virtio disk serializes concurrent
  I/O and would otherwise measure the device, not the job;
- steady-state timing: one untimed warm pass over the full input
  C2-JITs the codegen'd hot paths, then the second pass is timed
  (standard JVM benchmarking practice; a cold pass is
  interpreter-bound and understates high-parallelism throughput);
  best of 3 timed passes per level to suppress VM scheduler noise;
- all executors share this 32-core host, so high executor counts also
  share memory bandwidth — on a real cluster each executor gets its own
  node resources; the same job runs unchanged via
  `spark-submit --py-files didtool_spark.zip --master yarn/k8s`.
"""
        )


if __name__ == "__main__":
    main()
