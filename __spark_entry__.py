"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship sessionized point-in-time feature query on
                 /root/testdata/sf0.001.
queries()      — one (spark, sf_dir) -> DataFrame callable per
                 implemented operator (SURVEY.md §2).
oracle_sql()   — matching ANSI-SQL (DuckDB) per query; column names and
                 float rounding aligned on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from didtool_spark.plans import demo_queries, operator_queries, pipeline_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return demo_queries.q_session_features(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        **demo_queries.QUERIES,
        **operator_queries.OP_QUERIES,
        **pipeline_queries.PIPELINE_QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    return {
        **demo_queries.ORACLES,
        **operator_queries.OP_ORACLES,
        **pipeline_queries.PIPELINE_ORACLES,
    }
