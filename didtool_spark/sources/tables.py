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


def _read_lines_parsed(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str,
    fmt: str,
    pre_filter=None,
) -> tuple[DataFrame, DataFrame]:
    """text source + from_json/from_csv with a corrupt-record field.

    The native JSON/CSV DataFrameReader forbids any query whose pruned
    column set is only the internal corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which makes
    a lazy quarantine frame impossible without caching the whole scan —
    a non-starter at 100 TB. Parsing lines explicitly has no such
    restriction and keeps both frames lazily derived from one source."""
    from pyspark.sql import functions as F

    full = f"{schema}, {corrupt_col} STRING"
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col}
    parse = F.from_json if fmt == "json" else F.from_csv
    lines = spark.read.text(path)
    if pre_filter is not None:
        lines = lines.where(pre_filter)
    parsed = lines.select(
        parse(F.col("value"), full, opts).alias("__r"), "value"
    )
    bad_mark = F.col(f"__r.{corrupt_col}")
    good = parsed.where(bad_mark.isNull()).select("__r.*").drop(corrupt_col)
    bad = parsed.where(bad_mark.isNotNull()).select(
        F.col("value").alias(corrupt_col)
    )
    return good, bad


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines reader with an EXPLICIT schema (schema inference costs
    a full extra scan at 100 TB and silently widens types) and a
    corrupt-record quarantine: returns (good_rows, quarantined_lines).
    Malformed lines never fail the job and never silently disappear —
    the quarantine frame is the audit trail."""
    return _read_lines_parsed(spark, path, schema, corrupt_col, "json")


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """CSV reader with explicit schema + corrupt-record quarantine,
    same contract as read_jsonl. With ``header=True`` lines equal to
    the schema's field-name header are dropped (explicit schema means
    the header carries no information)."""
    from pyspark.sql import functions as F

    pre = None
    if header:
        names = [f.strip().split()[0] for f in schema.split(",")]
        pre = F.col("value") != ",".join(names)
    return _read_lines_parsed(spark, path, schema, corrupt_col, "csv", pre)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED managed table: repeated joins/aggregations
    on ``bucket_col`` then skip their Exchange entirely (bucket-join).
    The write costs one shuffle; every subsequent co-located join is
    shuffle-free on that key — the right trade for fact tables joined
    many times (e.g. transcripts keyed by conv_id).

    Uses saveAsTable because bucket metadata lives in the session
    catalog; plain .parquet(path) cannot carry it."""
    writer = df.write.mode(mode).format("parquet")
    writer = writer.bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


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
