"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus transcript
feature-materialization throughput (the BASELINE.md metric).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "turns_per_sec": ..., "materialize_turns": ...}

The N vs 4N scaling-efficiency evidence lives in
scripts/scaling_bench.py -> BENCH/BASELINE.md (two parallelism levels
need two SparkContexts, too heavy for the per-round loop).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from didtool_spark.plans.materialize import run_throughput  # noqa: E402
from didtool_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "40000"))


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark("didtool-spark-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    # flagship throughput: ~40k convs x ~50 avg turns ≈ 2M turns
    thr = run_throughput(spark, n_convs=BENCH_CONVS, avg_turns=50)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "materialize_turns": thr["n_turns"],
                "materialize_sec": round(thr["sec"], 3),
                "turns_per_sec": round(thr["turns_per_sec"], 1),
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
