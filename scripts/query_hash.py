"""Engine-vs-engine equivalence helper for optimization work: run the
named queries and print the md5 of their driver-hash serialization
(check_oracle.serialize_rows semantics — sorted columns, round-6
floats, sorted rows). Compare hashes before/after a plan change to
prove the change is result-identical at scales where the DuckDB oracle
replay is too expensive.

Usage: python scripts/query_hash.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.check_oracle import serialize_rows  # noqa: E402


def main() -> int:
    import __spark_entry__ as entrymod
    from didtool_spark.session import get_spark

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("query-hash", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = {}
    for name in names:
        got = qs[name](spark, sf_dir).toPandas()
        h = hashlib.md5(
            "\n".join(serialize_rows(got)).encode()
        ).hexdigest()
        out[name] = {"rows": len(got), "hash": h}
        print(json.dumps({name: out[name]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
