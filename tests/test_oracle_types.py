"""Regression guard for the round-1/round-2 HUGEINT oracle bug.

The driver's correctness gate hashes values *with* their dtype formatting,
so a DuckDB oracle whose integer aggregate comes back as HUGEINT (-> pandas
float64/object) mismatches a Spark int64 column even when every value is
equal (VERDICT r01 sessionize/session_features, VERDICT r02 user_rollup).

This test runs EVERY ``oracle_sql()`` through DuckDB at sf0.001 and asserts
that any column Spark emits as an integral type also comes back from DuckDB
as a pandas integer dtype — i.e. the SQL wraps integer aggregates in
``CAST(... AS BIGINT)``.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TINY_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

INTEGRAL_SPARK = {"tinyint", "smallint", "int", "integer", "bigint", "long"}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_every_oracle_integer_column_is_bigint_cast(spark):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    problems = []
    for name, sql in oracles.items():
        spark_df = queries[name](spark, SF_DIR)
        spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
        exp = con.sql(sql).df()
        assert sorted(exp.columns) == sorted(spark_types), (
            f"{name}: oracle columns {sorted(exp.columns)} != spark "
            f"{sorted(spark_types)}"
        )
        for col, styp in spark_types.items():
            if styp not in INTEGRAL_SPARK:
                continue
            dt = exp[col].dtype
            ok = pd.api.types.is_integer_dtype(dt) or (
                dt == object
                and exp[col].map(lambda v: v is None or isinstance(v, (int, np.integer))).all()
                and exp[col].map(lambda v: v is None or abs(int(v)) < 2 ** 63).all()
            )
            if not ok:
                problems.append(f"{name}.{col}: spark={styp} duckdb_dtype={dt}")
    assert not problems, (
        "oracle integer columns not BIGINT-cast (HUGEINT/float leak):\n  "
        + "\n  ".join(problems)
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_no_oracle_emits_negative_zero():
    """Neg-zero lint (r4 gate reds trend_slope / quantile_norm).

    DuckDB ``round()`` preserves the sign of ``-1e-9`` (-> -0.0) while
    Spark's returns +0.0; the driver hashes *serialized* values, so a
    single -0.0 cell flips the whole query red even though every value
    compares equal.  The class fix is ``round(...) + 0`` on the oracle
    side; this lint runs every oracle through DuckDB at sf0.001 and
    fails on any float cell whose IEEE sign bit is set while the value
    is zero, so the class cannot re-enter.
    """
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    problems = []
    for name, sql in entrymod.oracle_sql().items():
        exp = con.sql(sql).df()
        for col in exp.columns:
            s = exp[col]
            if not pd.api.types.is_float_dtype(s.dtype):
                continue
            vals = s.to_numpy(dtype="float64", na_value=np.nan)
            neg_zero = (vals == 0.0) & np.signbit(vals)
            if neg_zero.any():
                problems.append(f"{name}.{col}: {int(neg_zero.sum())} -0.0 cells")
    assert not problems, (
        "oracle emits IEEE -0.0 (driver hash red; append `+ 0` after "
        "round()):\n  " + "\n  ".join(problems)
    )
