"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 and diff against its DuckDB
oracle (row count, sorted-column schema, order-insensitive values).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        # unify int flavors / nullable ints
        if str(df[c].dtype) in ("int32", "int64", "Int32", "Int64", "uint32"):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entrymod
    from didtool_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:28s} rows={len(got)} (rows-only check, no oracle)")
            continue
        exp = con.sql(oracles[name]).df()
        g, e = normalize(got), normalize(exp)
        ok_rows = len(g) == len(e)
        ok_cols = list(g.columns) == list(e.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    g, e, check_dtype=False, check_exact=False, atol=1e-6, rtol=1e-6
                )
                ok_vals = True
            except AssertionError as err:
                print(f"--- {name} value mismatch:\n{str(err)[:800]}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name:28s} {status} rows {len(g)}/{len(e)} cols_match={ok_cols}")
            if not ok_cols:
                print(f"   spark cols: {list(g.columns)}\n   duck  cols: {list(e.columns)}")
        else:
            print(f"{name:28s} {status} rows={len(g)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
