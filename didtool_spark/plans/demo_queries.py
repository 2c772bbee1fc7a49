"""Driver-contract queries: each engine operator exposed as a
(spark, sf_dir) -> DataFrame callable with a matching ANSI-SQL oracle
(DuckDB) over the same parquet tables.

Conventions (driver compares sorted-by-name columns + value hashes):
- every computed column is aliased identically in Spark and SQL;
- float outputs are rounded to 6 decimals on BOTH sides so
  associativity-of-float-addition differences between engines cannot
  flip the value hash;
- row order is irrelevant (driver hashes order-insensitively).

The `events` table (event_id, ts, user_id, event_type, value, props)
stands in for the transcripts shape: user_id ~ conv_id, event_id ~
turn ordering tie-break, ts ~ ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.temporal import (
    FeatureTable,
    asof_join,
    build_training_set,
    forward_fill,
    sessionize,
    with_lags,
    with_rolling,
)

GAP_S = 1800


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- temporal

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = sessionize(
        ev, gap_seconds=GAP_S, keys="user_id", ts_col="ts", order=("ts", "event_id")
    )
    return out.select("event_id", "user_id", "session_id")


SQL_SESSIONIZE = f"""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > {GAP_S}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
FROM g
"""


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = with_lags(
        ev, ["value"], lags=[1, 2], leads=[1],
        keys="user_id", order=("ts", "event_id"),
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value_lag1", 6).alias("value_lag1"),
        F.round("value_lag2", 6).alias("value_lag2"),
        F.round("value_lead1", 6).alias("value_lead1"),
    )


SQL_LAG_LEAD = """
SELECT event_id, user_id,
       round(lag(value, 1)  OVER w, 6) AS value_lag1,
       round(lag(value, 2)  OVER w, 6) AS value_lag2,
       round(lead(value, 1) OVER w, 6) AS value_lead1
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = with_rolling(
        ev,
        [("value", "sum", 5), ("value", "avg", 5), ("value", "max", 5)],
        keys="user_id",
        order=("ts", "event_id"),
        include_current=False,
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value_sum_last5", 6).alias("value_sum_last5"),
        F.round("value_avg_last5", 6).alias("value_avg_last5"),
        F.round("value_max_last5", 6).alias("value_max_last5"),
    )


SQL_ROLLING = """
SELECT event_id, user_id,
       round(sum(value) OVER w, 6) AS value_sum_last5,
       round(avg(value) OVER w, 6) AS value_avg_last5,
       round(max(value) OVER w, 6) AS value_max_last5
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
"""


def q_rolling_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour time-window aggregates (rangeBetween on epoch
    seconds), strictly historical (excludes rows within the current
    second via upper bound -1)."""
    ev = load(spark, sf_dir, "events")
    out = with_rolling(
        ev,
        [("value", "sum", 3600), ("value", "count", 3600)],
        keys="user_id",
        ts_col="ts",
        include_current=False,
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value_sum_3600s", 6).alias("value_sum_1h"),
        F.col("value_count_3600s").alias("value_count_1h"),
    )


SQL_ROLLING_TIME = """
SELECT event_id, user_id,
       round(sum(value) OVER w, 6) AS value_sum_1h,
       count(value) OVER w AS value_count_1h
FROM (SELECT *, date_diff('second', TIMESTAMP '1970-01-01', ts) AS ep FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ep
             RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING)
"""


def q_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill the last purchase amount onto every event."""
    ev = load(spark, sf_dir, "events").withColumn(
        "purchase_value", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    out = forward_fill(
        ev, ["purchase_value"], keys="user_id", order=("ts", "event_id")
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("purchase_value_ffill", 6).alias("last_purchase_value"),
    )


SQL_BACKFILL = """
SELECT event_id, user_id,
       round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING), 6) AS last_purchase_value
FROM events
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the value of the latest error event at-or-before
    it for the same user (point-in-time correct as-of join)."""
    ev = load(spark, sf_dir, "events")
    anchors = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    feats = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("err_value")
    )
    out = asof_join(
        anchors, feats, keys="user_id", ts_col="ts",
        value_cols=["err_value"], strict=False, strategy="window",
    )
    return out.select(
        "event_id", "user_id", F.round("err_value", 6).alias("last_error_value")
    )


def q_asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics via the skew-splitting bucketed strategy — the
    driver oracle doubles as an equivalence check between strategies."""
    ev = load(spark, sf_dir, "events")
    anchors = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    feats = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("err_value")
    )
    out = asof_join(
        anchors, feats, keys="user_id", ts_col="ts",
        value_cols=["err_value"], strict=False, strategy="bucketed", n_buckets=32,
    )
    return out.select(
        "event_id", "user_id", F.round("err_value", 6).alias("last_error_value")
    )


SQL_ASOF = """
WITH a AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     b AS (SELECT user_id, ts, value AS err_value FROM events WHERE event_type = 'error')
SELECT a.event_id, a.user_id, round(b.err_value, 6) AS last_error_value
FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
"""


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """direction='nearest' + tolerance as-of (pandas.merge_asof parity;
    temporal.py asof_join general window path): each purchase gets the
    error event CLOSEST in time for the same user — equidistant ties
    take the backward match — nulled when the gap exceeds 1 hour. The
    oracle runs DuckDB's backward AND forward ASOF joins and replays the
    tie + tolerance rule arithmetically."""
    ev = load(spark, sf_dir, "events")
    anchors = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    feats = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("err_value")
    )
    out = asof_join(
        anchors, feats, keys="user_id", ts_col="ts",
        value_cols=["err_value"], strategy="window",
        direction="nearest", tolerance=3600.0,
    )
    return out.select(
        "event_id", "user_id",
        F.round("err_value", 6).alias("nearest_error_value"),
    )


SQL_ASOF_NEAREST = """
WITH a AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     b AS (SELECT user_id, ts, value AS err_value FROM events WHERE event_type = 'error'),
bk AS (
  SELECT a.event_id, a.user_id, a.ts, b.ts AS bts, b.err_value AS bv
  FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
),
fw AS (
  SELECT a.event_id, b.ts AS fts, b.err_value AS fv
  FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts <= b.ts
),
pick AS (
  SELECT bk.event_id, bk.user_id,
         CASE
           WHEN bts IS NULL THEN fts
           WHEN fts IS NULL THEN bts
           WHEN date_diff('microsecond', bts, bk.ts)
                <= date_diff('microsecond', bk.ts, fts) THEN bts
           ELSE fts
         END AS mts,
         CASE
           WHEN bts IS NULL THEN fv
           WHEN fts IS NULL THEN bv
           WHEN date_diff('microsecond', bts, bk.ts)
                <= date_diff('microsecond', bk.ts, fts) THEN bv
           ELSE fv
         END AS mv,
         bk.ts AS ats
  FROM bk JOIN fw USING (event_id)
)
SELECT event_id, user_id,
       CASE WHEN mts IS NOT NULL
                 AND abs(date_diff('microsecond', mts, ats)) <= 3600000000
            THEN round(mv, 6) END AS nearest_error_value
FROM pick
"""


def q_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: sessionized per-user point-in-time feature vectors —
    sessionize + lag + strictly-trailing rolling + forward-fill in one
    plan (single shuffle on user_id; every window shares the same
    partitioning)."""
    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn(
        "purchase_value", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    out = sessionize(
        ev, gap_seconds=GAP_S, keys="user_id", ts_col="ts", order=("ts", "event_id")
    )
    out = with_lags(out, ["value"], lags=[1], keys="user_id", order=("ts", "event_id"))
    out = with_rolling(
        out, [("value", "sum", 3), ("value", "count", 3)],
        keys="user_id", order=("ts", "event_id"),
    )
    out = forward_fill(out, ["purchase_value"], keys="user_id", order=("ts", "event_id"))
    return out.select(
        "event_id",
        "user_id",
        "session_id",
        F.round("value_lag1", 6).alias("value_lag1"),
        F.round("value_sum_last3", 6).alias("value_sum_last3"),
        F.col("value_count_last3").alias("value_count_last3"),
        F.round("purchase_value_ffill", 6).alias("last_purchase_value"),
    )


SQL_SESSION_FEATURES = f"""
WITH g AS (
  SELECT *,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > {GAP_S}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(sum(is_new) OVER wc - 1 AS BIGINT) AS session_id,
       round(lag(value, 1) OVER w, 6) AS value_lag1,
       round(sum(value) OVER wr, 6) AS value_sum_last3,
       count(value) OVER wr AS value_count_last3,
       round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER wc, 6) AS last_purchase_value
FROM g
WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
       wc AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING),
       wr AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
"""


def q_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-level curation rollup: per user, event/session counts,
    value mass and activity span — the conversation-level table a
    training-data pipeline filters on (sessionize feeds a one-shuffle
    groupBy on the same key, so the rollup adds no extra exchange over
    the session ids)."""
    ev = load(spark, sf_dir, "events")
    s = sessionize(
        ev, gap_seconds=GAP_S, keys="user_id", ts_col="ts", order=("ts", "event_id")
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("session_id") + 1).alias("n_sessions"),
        F.round(F.sum("value"), 6).alias("value_sum"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchases"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


SQL_USER_ROLLUP = f"""
WITH g AS (
  SELECT event_id, user_id, ts, event_type, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > {GAP_S}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_type, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM g
)
SELECT user_id,
       count(*) AS n_events,
       max(session_id) + 1 AS n_sessions,
       round(sum(value), 6) AS value_sum,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM s GROUP BY user_id
"""


def q_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store multi-table point-in-time join: every error event
    gets the latest view value as of it (inclusive) AND the latest
    purchase value strictly before it — TWO feature tables with mixed
    strictness materialized in ONE Exchange+Sort via the tagged-union
    single-pass plan (build_training_set, strategy="window"). Feature
    tables are pre-deduped at (user_id, ts) so as-of ties are
    deterministic on both engines."""
    ev = load(spark, sf_dir, "events")
    anchors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts").agg(F.max("value").alias("val"))
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts").agg(F.max("value").alias("val"))
    )
    out = build_training_set(
        anchors,
        {"views": FeatureTable(views), "purch": FeatureTable(purch, strict=True)},
        keys="user_id",
        ts_col="ts",
    )
    return out.select(
        "event_id",
        F.round("views_val", 6).alias("last_view_value"),
        F.round("purch_val", 6).alias("last_purchase_value"),
    )


SQL_TRAINING_SET = """
WITH a AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
v AS (SELECT user_id, ts, max(value) AS val FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
p AS (SELECT user_id, ts, max(value) AS val FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
av AS (
  SELECT a.event_id, a.user_id, a.ts, v.val AS vval
  FROM a ASOF LEFT JOIN v ON a.user_id = v.user_id AND a.ts >= v.ts
)
SELECT av.event_id,
       round(av.vval, 6) AS last_view_value,
       round(p.val, 6) AS last_purchase_value
FROM av ASOF LEFT JOIN p ON av.user_id = p.user_id AND av.ts > p.ts
"""


QUERIES = {
    "sessionize": q_sessionize,
    "user_rollup": q_user_rollup,
    "lag_lead": q_lag_lead,
    "rolling": q_rolling,
    "rolling_time": q_rolling_time,
    "backfill": q_backfill,
    "asof_join": q_asof_join,
    "asof_join_bucketed": q_asof_join_bucketed,
    "asof_nearest": q_asof_nearest,
    "session_features": q_session_features,
    "training_set": q_training_set,
}

ORACLES = {
    "sessionize": SQL_SESSIONIZE,
    "user_rollup": SQL_USER_ROLLUP,
    "lag_lead": SQL_LAG_LEAD,
    "rolling": SQL_ROLLING,
    "rolling_time": SQL_ROLLING_TIME,
    "backfill": SQL_BACKFILL,
    "asof_join": SQL_ASOF,
    "asof_join_bucketed": SQL_ASOF,
    "asof_nearest": SQL_ASOF_NEAREST,
    "session_features": SQL_SESSION_FEATURES,
    "training_set": SQL_TRAINING_SET,
}
