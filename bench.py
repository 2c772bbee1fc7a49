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
    queries = entrymod.queries()
    # one untimed warmup: first-touch costs (parquet schema inference,
    # Hadoop FS init, C2 JIT of the codegen hot paths) belong to the
    # session, not to whichever query happens to run first
    warm = next(iter(queries.values()))
    warm(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for name, fn in queries.items():
        # timed section covers plan CONSTRUCTION too — some operators
        # run eager bounded passes while building (cached candidate
        # tables, corpus means); timing only the final action would
        # undercount them. Best of 2 full construction+execution reps
        # (cache cleared before each) suppresses one-off scheduler/GC
        # noise without hiding any per-query work.
        dt = None
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            d = time.time() - t0
            dt = d if dt is None else min(dt, d)
            spark.catalog.clearCache()
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
                # r1 timed only the final action; fitted operators do
                # real work (driver-collect fits, eager candidate
                # caches) during plan construction, so r2+ times
                # construction+execution per query (see BENCH/NOTES.md —
                # action-only totals are NOT comparable across rounds)
                "timing": "construction+execution, steady-state (1 warmup), best of 2 reps, cache cleared per rep",
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
