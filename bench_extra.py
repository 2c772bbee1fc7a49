"""Per-query isolation bench (guide §1.4): time ONE named query with the
noop sink, optionally dump .explain('formatted') to a file.

Usage:
  python bench_extra.py <query> [reps] [--explain out.txt]

Env (same contract as bench.py): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
This file is NOT part of the frozen measurement surface (bench.py is);
it exists so optimization work can time and inspect single queries
without re-running the full 140-query loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from didtool_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entrymod

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain_out = None
    if "--explain" in sys.argv:
        explain_out = sys.argv[sys.argv.index("--explain") + 1]
    name = args[0]
    reps = int(args[1]) if len(args) > 1 else 2

    queries = entrymod.queries()
    fn = queries[name]

    spark = get_spark("didtool-spark-bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # warmup on a cheap query to absorb session first-touch costs
    warm = queries.get("skew_stats", next(iter(queries.values())))
    warm(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    samples = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
        if explain_out and i == 0:
            with open(explain_out, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        spark.catalog.clearCache()
    print(json.dumps({
        "query": name, "sf_dir": SF_DIR, "samples": samples,
        "best": min(samples), "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
