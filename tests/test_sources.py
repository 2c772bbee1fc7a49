"""Source formats: JSONL/CSV with corrupt-record quarantine; bucketed
table writes that make key-joins shuffle-free."""

from pyspark.sql import functions as F

from didtool_spark.sources.tables import (
    read_csv_table,
    read_jsonl,
    write_bucketed_table,
)


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world"}',
        '{"doc_id": 2, "text": "zwei"}',
        'this is not json at all',
        '{"doc_id": 4, "text": "ok", "extra": "ignored"}',
        '{"doc_id": "not-an-int-but-string-coerces?", "text": "x"}',
    ]
    p.write_text("\n".join(lines))
    good, bad = read_jsonl(spark, str(p), "doc_id BIGINT, text STRING")
    g = good.orderBy("doc_id").collect()
    assert [r["doc_id"] for r in g if r["doc_id"] is not None] == [1, 2, 4]
    assert bad.count() >= 1  # the non-json line is quarantined, not lost
    assert "not json" in bad.first()["_corrupt_record"]


def test_read_csv_quarantine(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "t.csv"
    p.write_text("id,val\n1,3.5\n2,oops\n3,7.25\n")
    good, bad = read_csv_table(spark, str(p), "id INT, val DOUBLE")
    vals = {r["id"]: r["val"] for r in good.where(F.col("val").isNotNull()).collect()}
    assert vals == {1: 3.5, 3: 7.25}
    assert bad.count() == 1
    assert "oops" in bad.first()["_corrupt_record"]


def test_bucketed_table_join_skips_exchange(spark, tmp_path_factory):
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    df = spark.range(1000).select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        (F.col("id") % 97).cast("int").alias("x"),
    )
    write_bucketed_table(df, "bkt_turns", "conv_id", n_buckets=8)
    write_bucketed_table(
        df.select("conv_id", (F.col("x") * 2).alias("y")),
        "bkt_feats",
        "conv_id",
        n_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the tiny test tables take the sort-merge
        # path a TB-scale fact-fact join would take — that is the plan
        # bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("bkt_turns")
        b = spark.table("bkt_feats")
        joined = a.join(b, "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides pre-bucketed on the join key: a sort-merge join with
        # ZERO shuffle exchanges in the plan
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_turns")
        spark.sql("DROP TABLE IF EXISTS bkt_feats")
