"""Table sources/sinks.

Parquet star-schema loaders for the driver testdata, plus a thin
warehouse abstraction: Iceberg when the runtime ships the jars
(``get_spark(iceberg_warehouse=...)`` registers the catalog), parquet
snapshot directories otherwise (didtool_spark.plans.checkpoint provides
the snapshot/manifest semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        t: load_table(spark, sf_dir, t)
        for t in TABLES
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    }


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() works the way
    the DuckDB oracle side does."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_feature_table(
    df: DataFrame,
    path_or_table: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a feature table: Iceberg table name (catalog.db.table) when
    the catalog exists, else a parquet directory. At scale partition by
    a conv_id hash bucket + day(ts)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if "." in path_or_table and not path_or_table.startswith("/"):
        writer.saveAsTable(path_or_table, format="iceberg")
    else:
        writer.parquet(path_or_table)
