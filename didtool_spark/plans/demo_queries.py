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

from ..operators.labels import with_future_label
from ..operators.parity import transcript_parity
from ..operators.stats_features import group_quantiles, heavy_hitters
from ..operators.ts_features import (
    with_decayed,
    with_recency,
    with_rolling_distinct,
    with_trend,
    with_zscore,
)
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


# The gate tables arrive as ONE parquet file each with very few row
# groups (the sf1.0 set: events 1M rows / 1 row group, documents 50k /
# 1), so a bare read is a ONE-task scan — every per-row-heavy
# expression chain (token split + md5 per gram, text features, grid
# interpolation) serializes on a single core however many the session
# has.  Guide §2.5 ("input skew: one huge unsplittable file …
# repartition immediately after the read"): spread a table over the
# session's parallelism by hashing its unique key — deterministic (no
# round-robin sort, no rand()), and an EXPLICIT partition count so
# AQE's byte-based coalescing (which sees only MBs here) cannot fold
# the CPU-heavy work back onto one task.  Filters and column pruning
# push through RepartitionByExpression, so scans keep PushedFilters /
# narrow ReadSchema.
#
# Policy (measured at sf1.0, BENCH/r06_baseline_sf1.json vs the
# re-run): `documents` and `embeddings` spread by DEFAULT — every
# consumer tokenizes/hashes or runs vector kernels per row, and the
# blanket measurement showed only wins.  The row-heavy relational
# tables (events/lineitem/orders/customer) spread ONLY where the query
# opts in (spread=True at the call site): for expression-light window/
# join queries the extra exchange is a pure ~0.3-1.5s tax, and for the
# exact-percentile fits it even makes the single-reducer merge WORSE
# (32 partial value-count maps to merge instead of 1-6).  Scale note:
# the partition count derives from defaultParallelism (executor count
# on a cluster), never a local constant; on inputs already laid out as
# many splits the extra exchange is one pruned-column pass — and the
# keyed spread is how the same query survives a single giant
# gzip/one-row-group input at any scale.
_SPREAD_KEYS = {
    "documents": "doc_id",
    "events": "event_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "embeddings": "vec_id",
}

_SPREAD_DEFAULT = {"documents", "embeddings"}


def load(
    spark: SparkSession, sf_dir: str, name: str, spread: bool | None = None
) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread is None:
        spread = name in _SPREAD_DEFAULT
    key = _SPREAD_KEYS.get(name)
    if spread and key is not None:
        df = df.repartition(spark.sparkContext.defaultParallelism, F.col(key))
    return df


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


def q_future_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-window label construction (operators/labels.py): per
    event, whether an 'error' occurs for the same user within the next
    600s, and the purchase value accumulated in the next hour — both
    strictly future (the anchor row's own frame starts at +1s, so the
    label never reads the features' history).  Runs the bucketed
    hot-key-safe strategy; the window form is equivalence-tested in
    tests/test_labels.py."""
    ev = (
        load(spark, sf_dir, "events")
        .withColumn(
            "is_error", (F.col("event_type") == "error").cast("int")
        )
        .withColumn(
            "purchase_value",
            F.when(F.col("event_type") == "purchase", F.col("value")),
        )
    )
    out = with_future_label(
        ev,
        [("is_error", "max", 600), ("purchase_value", "sum", 3600)],
        keys="user_id",
        ts_col="ts",
        fill=0,
        strategy="bucketed",
        bucket_seconds=86400,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("is_error_max_next600s").cast("long").alias("error_next_600s"),
        F.round("purchase_value_sum_next3600s", 6).alias("purchase_next_1h"),
    )


def q_time_to_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival labels (operators/labels.py with_time_to_event):
    per event, seconds until the user's FIRST strictly-future 'error'
    event, right-censored at 24h (tte_s NULL + observed false).  Runs
    the bucketed hot-key-safe strategy; window equivalence is covered
    in tests/test_labels.py and the randomized fuzz suite."""
    from ..operators.labels import with_time_to_event

    ev = load(spark, sf_dir, "events")
    out = with_time_to_event(
        ev, F.col("event_type") == "error", 86400,
        keys="user_id", ts_col="ts", name="tte",
        strategy="bucketed", bucket_seconds=86400,
    )
    # tte_s is nullable (censored rows) -> double on both sides, the
    # registry convention for nullable integer outputs (pandas would
    # float64 a nullable BIGINT anyway)
    return out.select(
        "event_id", "user_id",
        F.col("tte_s").cast("double").alias("tte_s"), "tte_observed",
    )


SQL_TIME_TO_EVENT = """
SELECT event_id, user_id,
       CAST(min(CASE WHEN event_type = 'error' THEN ep END) OVER w - ep
            AS DOUBLE) AS tte_s,
       min(CASE WHEN event_type = 'error' THEN ep END) OVER w IS NOT NULL
           AS tte_observed
FROM (SELECT *, date_diff('second', TIMESTAMP '1970-01-01', ts) AS ep FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ep
             RANGE BETWEEN 1 FOLLOWING AND 86400 FOLLOWING)
"""


SQL_FUTURE_LABEL = """
SELECT event_id, user_id,
       CAST(coalesce(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                     OVER w600, 0) AS BIGINT) AS error_next_600s,
       round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END)
                      OVER w3600, 0), 6) AS purchase_next_1h
FROM (SELECT *, date_diff('second', TIMESTAMP '1970-01-01', ts) AS ep FROM events)
WINDOW w600 AS (PARTITION BY user_id ORDER BY ep
                RANGE BETWEEN 1 FOLLOWING AND 600 FOLLOWING),
       w3600 AS (PARTITION BY user_id ORDER BY ep
                 RANGE BETWEEN 1 FOLLOWING AND 3600 FOLLOWING)
"""


def q_multi_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store-style multi-horizon trailing aggregates: count and
    sum of value per user at 10-minute / 1-hour / 6-hour horizons, all
    from ONE pass — the three rangeBetween frames share a single
    partitionBy(user).orderBy(epoch) sort, so Catalyst plans one
    exchange + one sort for all six columns (asserted in
    tests/test_plan_shape.py)."""
    ev = load(spark, sf_dir, "events")
    out = with_rolling(
        ev,
        [
            ("value", "sum", 600), ("value", "count", 600),
            ("value", "sum", 3600), ("value", "count", 3600),
            ("value", "sum", 21600), ("value", "count", 21600),
        ],
        keys="user_id",
        ts_col="ts",
        include_current=False,
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value_sum_600s", 6).alias("sum_10m"),
        F.col("value_count_600s").alias("cnt_10m"),
        F.round("value_sum_3600s", 6).alias("sum_1h"),
        F.col("value_count_3600s").alias("cnt_1h"),
        F.round("value_sum_21600s", 6).alias("sum_6h"),
        F.col("value_count_21600s").alias("cnt_6h"),
    )


SQL_MULTI_HORIZON = """
SELECT event_id, user_id,
       round(sum(value) OVER w600, 6) AS sum_10m,
       count(value) OVER w600 AS cnt_10m,
       round(sum(value) OVER w3600, 6) AS sum_1h,
       count(value) OVER w3600 AS cnt_1h,
       round(sum(value) OVER w21600, 6) AS sum_6h,
       count(value) OVER w21600 AS cnt_6h
FROM (SELECT *, date_diff('second', TIMESTAMP '1970-01-01', ts) AS ep FROM events)
WINDOW w600 AS (PARTITION BY user_id ORDER BY ep
                RANGE BETWEEN 600 PRECEDING AND 1 PRECEDING),
       w3600 AS (PARTITION BY user_id ORDER BY ep
                 RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING),
       w21600 AS (PARTITION BY user_id ORDER BY ep
                  RANGE BETWEEN 21600 PRECEDING AND 1 PRECEDING)
"""


def q_transcript_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn text-equality validation (operators/parity.py) between
    two deterministic variants of the events-as-transcript table: the
    left drops event_id%89==0 turns, the right drops %97==0 and corrupts
    the text of %101==0 — so all four statuses (match / diff /
    left_only / right_only) appear and the one-join classification is
    value-checked end to end."""
    ev = load(spark, sf_dir, "events")
    left = ev.where(F.pmod("event_id", F.lit(89)) != 0).select(
        "user_id", "event_id", F.col("event_type").alias("text")
    )
    right = ev.where(F.pmod("event_id", F.lit(97)) != 0).select(
        "user_id",
        "event_id",
        F.when(
            F.pmod("event_id", F.lit(101)) == 0,
            F.concat(F.col("event_type"), F.lit("X")),
        ).otherwise(F.col("event_type")).alias("text"),
    )
    return transcript_parity(
        left, right, keys=("user_id", "event_id"), compare_cols=("text",)
    )


SQL_TRANSCRIPT_PARITY = """
WITH l AS (
  SELECT user_id, event_id, event_type AS text, TRUE AS in_l
  FROM events WHERE event_id % 89 <> 0
),
r AS (
  SELECT user_id, event_id,
         CASE WHEN event_id % 101 = 0 THEN event_type || 'X'
              ELSE event_type END AS text,
         TRUE AS in_r
  FROM events WHERE event_id % 97 <> 0
),
j AS (
  SELECT coalesce(l.user_id, r.user_id) AS conv,
         CASE WHEN l.in_l IS NULL THEN 'right_only'
              WHEN r.in_r IS NULL THEN 'left_only'
              WHEN l.text IS DISTINCT FROM r.text THEN 'diff'
              ELSE 'match' END AS status
  FROM l FULL OUTER JOIN r
    ON l.user_id = r.user_id AND l.event_id = r.event_id
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT conv) AS BIGINT) AS n_convs
FROM j GROUP BY status
"""


def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity exact quantile features (operators/stats_features.py):
    median and p90 of value per user via Spark's exact `percentile`
    aggregate (linear interpolation == SQL quantile_cont) — ONE
    map-side-combinable shuffle; `approx=True` is the documented
    t-digest path for hot/global keys."""
    ev = load(spark, sf_dir, "events")
    q = group_quantiles(ev, "value", [0.5, 0.9], keys="user_id")
    return q.select(
        "user_id",
        F.round("value_p50", 6).alias("value_p50"),
        F.round("value_p90", 6).alias("value_p90"),
    )


SQL_GROUP_QUANTILES = """
SELECT user_id,
       round(quantile_cont(value, 0.5), 6) AS value_p50,
       round(quantile_cont(value, 0.9), 6) AS value_p90
FROM events GROUP BY user_id
"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 most frequent event types per user with deterministic
    count-DESC/item-ASC ties: the shuffle carries one row per DISTINCT
    (user, item) — map-side combined — and the rank window runs over
    the aggregated count table."""
    ev = load(spark, sf_dir, "events")
    out = heavy_hitters(ev, "event_type", keys="user_id", k=2)
    return out.select(
        "user_id", F.col("rank").cast("long").alias("rank"), "item", "n"
    )


SQL_HEAVY_HITTERS = """
WITH c AS (
  SELECT user_id, event_type AS item, count(*) AS n
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT user_id, item, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, item ASC) AS rank
  FROM c
)
SELECT user_id, CAST(rank AS BIGINT) AS rank, item, CAST(n AS BIGINT) AS n
FROM r WHERE rank <= 2
"""


def q_decayed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed sum/count features
    (operators/ts_features.py with_decayed), strategy="bucketed" — the
    overflow-free, hot-key-safe path: per-(key, 64-half-life bucket)
    exp-rebased running sums plus an F.aggregate carry fold over the
    tiny per-key bucket-summary array (factors all <= 1).  The oracle
    replays the defining formula directly (correlated subquery — exact,
    O(frame) per row, fine at gate scale)."""
    ev = load(spark, sf_dir, "events")
    out = with_decayed(
        ev,
        [("value", "sum"), ("value", "count")],
        half_life_s=3600.0,
        keys="user_id",
        order=("ts", "event_id"),
        ts_col="ts",
        strategy="bucketed",
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value_decsum_3600s", 6).alias("value_decsum_3600s"),
        F.round("value_deccount_3600s", 6).alias("value_deccount_3600s"),
    )


SQL_DECAYED = """
SELECT a.event_id, a.user_id,
  round((SELECT sum(b.value * exp(-ln(2)/3600.0
                    * (epoch_us(a.ts) - epoch_us(b.ts)) / 1e6))
           FROM events b WHERE b.user_id = a.user_id
            AND (b.ts < a.ts OR (b.ts = a.ts AND b.event_id < a.event_id))),
        6) AS value_decsum_3600s,
  round((SELECT sum(exp(-ln(2)/3600.0
                    * (epoch_us(a.ts) - epoch_us(b.ts)) / 1e6))
           FROM events b WHERE b.user_id = a.user_id
            AND (b.ts < a.ts OR (b.ts = a.ts AND b.event_id < a.event_id))),
        6) AS value_deccount_3600s
FROM events a
"""


def q_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency features (operators/ts_features.py with_recency):
    inter-arrival seconds + seconds/rows since the most recent strictly
    earlier 'error' event — pure lag / running-max expressions over
    integer microseconds on ONE key-ordered window sort."""
    ev = load(spark, sf_dir, "events")
    out = with_recency(
        ev,
        {"error": F.col("event_type") == "error"},
        keys="user_id",
        order=("ts", "event_id"),
        ts_col="ts",
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("secs_since_prev", 6).alias("secs_since_prev"),
        F.round("secs_since_error", 6).alias("secs_since_error"),
        # double, not bigint: the column is NULL before a user's first
        # error, and a nullable integer round-trips through pandas as
        # float64 on the DuckDB side only — dtype-mismatching the hash
        F.col("rows_since_error").cast("double").alias("rows_since_error"),
    )


SQL_RECENCY = """
WITH b AS (
  SELECT event_id, user_id, ts, event_type,
         row_number() OVER w AS rn,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6 AS secs_since_prev
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
  round(secs_since_prev, 6) AS secs_since_prev,
  round((epoch_us(ts) - max(CASE WHEN event_type = 'error'
                                 THEN epoch_us(ts) END) OVER wp) / 1e6,
        6) AS secs_since_error,
  CAST(rn - max(CASE WHEN event_type = 'error' THEN rn END) OVER wp
       AS DOUBLE) AS rows_since_error
FROM b
WINDOW wp AS (PARTITION BY user_id ORDER BY rn
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct counts (operators/ts_features.py
    with_rolling_distinct): distinct event types over the trailing 10
    rows AND over the trailing 2h range — frame-bounded per-row state;
    the time mode's bucketed strategy (context duplication) is the
    hot-key path, equivalence-tested in tests/test_ts_features.py."""
    ev = load(spark, sf_dir, "events")
    out = with_rolling_distinct(
        ev, "event_type", k=10, keys="user_id", order=("ts", "event_id")
    )
    out = with_rolling_distinct(
        out, "event_type", seconds=7200, keys="user_id",
        order=("ts", "event_id"), ts_col="ts",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_type_nunique_last10").cast("long").alias(
            "event_type_nunique_last10"
        ),
        F.col("event_type_nunique_7200s").cast("long").alias(
            "event_type_nunique_7200s"
        ),
    )


SQL_ROLLING_DISTINCT = """
SELECT event_id, user_id,
  CAST(count(DISTINCT event_type) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS BIGINT)
    AS event_type_nunique_last10,
  CAST(count(DISTINCT event_type) OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts)
    RANGE BETWEEN 7200000000 PRECEDING AND 1 PRECEDING) AS BIGINT)
    AS event_type_nunique_7200s
FROM events
"""


def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS trend slope (operators/ts_features.py with_trend):
    closed form from five running sums on one window sort; x rebased to
    per-key seconds so the co-moment stays out of double-cancellation
    territory (epoch^2 would eat 2/3 of the mantissa)."""
    ev = load(spark, sf_dir, "events")
    out = with_trend(
        ev, "value", 8, keys="user_id", order=("ts", "event_id"), ts_col="ts"
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value_slope_last8", 6).alias("value_slope_last8"),
    )


SQL_TREND = """
WITH b AS (
  SELECT event_id, user_id, ts, value,
    (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id)) / 1e6 AS x
  FROM events
), s AS (
  SELECT event_id, user_id,
    CAST(count(value) OVER w AS DOUBLE) AS n,
    sum(CASE WHEN value IS NOT NULL THEN x END) OVER w AS sx,
    sum(value) OVER w AS sy,
    sum(CASE WHEN value IS NOT NULL THEN x END * value) OVER w AS sxy,
    sum(CASE WHEN value IS NOT NULL THEN x * x END) OVER w AS sxx
  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id,
  -- `+ 0` folds DuckDB round()'s IEEE -0.0 into +0.0 (Spark's round
  -- never emits -0.0; the driver hashes serialized values, so the
  -- sign of zero is load-bearing).  r4 VERDICT "What's wrong #1".
  round(CASE WHEN n * sxx - sx * sx > 0
             THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END,
        6) + 0 AS value_slope_last8
FROM s
"""


def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score (operators/ts_features.py with_zscore): thin
    composition over with_rolling(avg, stddev) — shares its single
    Exchange+Sort and inherits the bucketed hot-key strategy."""
    ev = load(spark, sf_dir, "events")
    out = with_zscore(ev, "value", 10, keys="user_id", order=("ts", "event_id"))
    return out.select(
        "event_id",
        "user_id",
        F.round("value_z_last10", 6).alias("value_z_last10"),
    )


SQL_ZSCORE = """
WITH s AS (
  SELECT event_id, user_id, value,
    avg(value) OVER w AS m, stddev_samp(value) OVER w AS sd
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id,
  round(CASE WHEN sd > 0 THEN (value - m) / sd END, 6) AS value_z_last10
FROM s
"""


def q_feature_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed crossed feature (operators/feature_hash.py hashed_cross):
    event_type x (user_id % 7) into 64 buckets — stateless, fit-free,
    pure codegen.  Gate uses hash_fn='md5_60' so DuckDB replays the
    exact bucket ids; the engine default is JVM xxhash64."""
    from ..operators.feature_hash import hashed_cross

    ev = load(spark, sf_dir, "events").withColumn(
        "__u7", (F.col("user_id") % 7).cast("string")
    )
    out = hashed_cross(
        ev, ["event_type", "__u7"], 64, out_col="cross_b", hash_fn="md5_60"
    )
    return out.select("event_id", "cross_b")


SQL_FEATURE_CROSS = """
SELECT event_id,
       CAST(('0x' || substr(md5(concat_ws(chr(31),
                coalesce(event_type, chr(0)),
                coalesce(CAST(user_id % 7 AS VARCHAR), chr(0)))),
             1, 15))::BIGINT % 64 AS BIGINT) AS cross_b
FROM events
"""


def q_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick sparse vector (feature_hash.py hash_vectorize):
    one categorical + one numeric column into 32 signed hashed slots,
    exploded to (event_id, idx, v) long form for the value hash.
    Per-row duplicate indices are expression-fold-merged."""
    from ..operators.feature_hash import hash_vectorize_long

    ev = load(spark, sf_dir, "events", spread=True)
    # long form directly (r6): identical rows to exploding the
    # canonical hash_vectorize array (parity-tested), without paying
    # the interpreted per-row fold under the explode — see
    # feature_hash.hash_vectorize_long
    out = hash_vectorize_long(
        ev,
        "event_id",
        cat_cols=["event_type"],
        num_cols=["value"],
        n_features=32,
        hash_fn="md5_60",
    )
    return out.select("event_id", "idx", F.round("v", 6).alias("v"))


SQL_HASH_FEATURES = """
WITH toks AS (
  SELECT event_id,
         'event_type=' || coalesce(event_type, chr(0)) AS tok,
         1.0 AS v
  FROM events
  UNION ALL
  SELECT event_id, 'value' AS tok, value
  FROM events WHERE value IS NOT NULL
),
h AS (
  SELECT event_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 32 AS idx,
         CASE WHEN ('0x' || substr(md5(tok || '#s'), 1, 15))::BIGINT % 2 = 0
              THEN v ELSE -v END AS sv
  FROM toks
)
SELECT event_id, CAST(idx AS BIGINT) AS idx, round(sum(sv), 6) AS v
FROM h GROUP BY event_id, idx
"""


def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table (operators/calibration.py): a logistic score
    of value vs a purchase/signup event label, 10 equal-width bins —
    per-bin count, mean score, event rate, calibration gap.  One
    map-side-combined groupBy; n_bins rows of state."""
    from ..operators.calibration import reliability_table

    ev = load(spark, sf_dir, "events")
    scored = ev.withColumn(
        "score", 1.0 / (1.0 + F.exp(-(F.col("value") - 50.0) / 25.0))
    ).withColumn(
        "label", F.col("event_type").isin("purchase", "signup").cast("int")
    )
    out = reliability_table(scored, "score", "label", n_bins=10)
    return out.select(
        "bin",
        "n",
        F.round("avg_score", 6).alias("avg_score"),
        F.round("event_rate", 6).alias("event_rate"),
        F.round("gap", 6).alias("gap"),
    )


SQL_CALIBRATION = """
WITH s AS (
  SELECT 1.0 / (1.0 + exp(-(value - 50.0) / 25.0)) AS score,
         CAST(event_type IN ('purchase', 'signup') AS INT) AS label
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
b AS (
  SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
         count(*) AS n, avg(score) AS avg_score,
         avg(CAST(label AS DOUBLE)) AS event_rate
  FROM s GROUP BY 1
)
SELECT bin, CAST(n AS BIGINT) AS n, round(avg_score, 6) AS avg_score,
       round(event_rate, 6) AS event_rate,
       round(abs(event_rate - avg_score), 6) AS gap
FROM b
"""


def q_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (calibration.py cohen_kappa) between two heuristic
    labelers — value > 5 vs event_type in (purchase, signup).  The
    contingency table is the only shuffle (n_classes^2 rows); po/pe/
    kappa reduce over it."""
    from ..operators.calibration import cohen_kappa

    ev = load(spark, sf_dir, "events")
    lab = ev.withColumn("a", (F.col("value") > 5.0).cast("int")).withColumn(
        "b", F.col("event_type").isin("purchase", "signup").cast("int")
    )
    out = cohen_kappa(lab, "a", "b")
    return out.select(
        "n",
        F.round("po", 6).alias("po"),
        F.round("pe", 6).alias("pe"),
        F.round("kappa", 6).alias("kappa"),
    )


SQL_LABEL_AGREEMENT = """
WITH l AS (
  SELECT CAST(value > 5.0 AS INT) AS a,
         CAST(event_type IN ('purchase', 'signup') AS INT) AS b
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
c AS (SELECT a, b, count(*) AS n FROM l GROUP BY a, b),
agg AS (
  SELECT sum(n) AS n,
         sum(CASE WHEN a = b THEN n ELSE 0 END) * 1.0 / sum(n) AS po
  FROM c
),
pe AS (
  SELECT sum(x.na * 1.0 * y.nb) AS s
  FROM (SELECT a, sum(n) AS na FROM c GROUP BY a) x
  JOIN (SELECT b, sum(n) AS nb FROM c GROUP BY b) y ON x.a = y.b
)
SELECT CAST(agg.n AS BIGINT) AS n,
       round(agg.po, 6) AS po,
       round(pe.s / (agg.n * 1.0 * agg.n), 6) AS pe,
       round(CASE WHEN pe.s / (agg.n * 1.0 * agg.n) < 1.0
                  THEN (agg.po - pe.s / (agg.n * 1.0 * agg.n))
                       / (1.0 - pe.s / (agg.n * 1.0 * agg.n)) END, 6) AS kappa
FROM agg, pe
"""


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Markov transition counts of event_type
    (operators/seq_features.py transition_counts): one lag window on
    the shared (user, ts, event_id) sort + one map-side-combined
    groupBy over (user, from, to)."""
    from ..operators.seq_features import transition_counts

    ev = load(spark, sf_dir, "events")
    out = transition_counts(
        ev, "event_type", keys="user_id", order=("ts", "event_id")
    )
    return out.select("user_id", "from", "to", "n")


SQL_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER w AS prev,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, prev AS "from", event_type AS "to",
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE rn > 1 GROUP BY user_id, prev, event_type
"""


def q_turn_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-to-turn token Jaccard (seq_features.py with_turn_novelty)
    over the props payload per user: tokenize/lag/set ops all inside
    whole-stage codegen on the shared entity sort — a loop/stall
    signal (1.0 = the turn repeats the previous one)."""
    from ..operators.seq_features import with_turn_novelty

    ev = load(spark, sf_dir, "events", spread=True)
    out = with_turn_novelty(ev, "props", keys="user_id", order=("ts", "event_id"))
    return out.select(
        "event_id",
        "user_id",
        F.round("props_jaccard_prev", 6).alias("props_jaccard_prev"),
    )


SQL_TURN_NOVELTY = """
WITH t AS (
  SELECT event_id, user_id, ts,
         coalesce(list_distinct(list_filter(
           string_split_regex(lower(props), '[^a-z0-9]+'),
           x -> x <> '')), []) AS toks
  FROM events
),
p AS (
  SELECT event_id, user_id, toks,
         lag(toks) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM t
)
SELECT event_id, user_id,
       round(CASE WHEN prev IS NOT NULL
                   AND len(list_distinct(list_concat(toks, prev))) > 0
              THEN len(list_filter(toks, x -> list_contains(prev, x))) * 1.0
                   / len(list_distinct(list_concat(toks, prev)))
              END, 6) AS props_jaccard_prev
FROM p
"""


def q_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean/max embedding pooling (operators/pooling.py):
    posexplode -> groupBy(label, dim) with map-side combine — the
    shuffle carries (labels x dims) aggregated rows and a hot label
    spreads over dim reducers.  Gate returns the long form."""
    from ..operators.pooling import pool_embeddings

    emb = load(spark, sf_dir, "embeddings")
    out = pool_embeddings(
        emb, "embedding", keys="label", aggs=("mean", "max"), long=True
    )
    return out.select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.round("mean", 6).alias("mean_v"),
        F.round("max", 6).alias("max_v"),
        "n_vecs",
    )


SQL_EMBEDDING_POOL = """
WITH e AS (
  SELECT label,
         unnest(embedding) AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
  WHERE embedding IS NOT NULL
)
SELECT label, CAST(i - 1 AS BIGINT) AS dim,
       round(avg(CAST(v AS DOUBLE)), 6) AS mean_v,
       round(max(CAST(v AS DOUBLE)), 6) AS max_v,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM e GROUP BY label, i
"""


def q_scale_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard scaling (operators/scalers.py fit_scaler/apply_scaler):
    three columns fitted in ONE melted map-side-combined aggregation
    over ONE scan; the transform inlines the O(columns) constants as
    literals — pure codegen, no data join."""
    from ..operators.scalers import apply_scaler, fit_scaler

    li = load(spark, sf_dir, "lineitem", spread=True)
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    stats = fit_scaler(li, cols, method="standard")
    out = apply_scaler(li.select("l_orderkey", "l_linenumber", *cols), stats)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        *[F.round(f"{c}_scaled", 6).alias(f"{c}_scaled") for c in cols],
    )


SQL_SCALE_FEATURES = """
WITH s AS (
  SELECT avg(l_quantity) AS m1, stddev_samp(l_quantity) AS s1,
         avg(l_extendedprice) AS m2, stddev_samp(l_extendedprice) AS s2,
         avg(l_discount) AS m3, stddev_samp(l_discount) AS s3
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
  -- `+ 0` folds round()'s IEEE -0.0 into +0.0 (driver hash parity —
  -- a value within 5e-7 of the mean rounds to -0.0 in DuckDB only;
  -- surfaced by the sf0.1 bitexact sweep, invisible at sf0.01)
  round(CASE WHEN s1 > 0 THEN (l_quantity - m1) / s1
             WHEN l_quantity IS NOT NULL THEN 0.0 END, 6) + 0
    AS l_quantity_scaled,
  round(CASE WHEN s2 > 0 THEN (l_extendedprice - m2) / s2
             WHEN l_extendedprice IS NOT NULL THEN 0.0 END, 6) + 0
    AS l_extendedprice_scaled,
  round(CASE WHEN s3 > 0 THEN (l_discount - m3) / s3
             WHEN l_discount IS NOT NULL THEN 0.0 END, 6) + 0
    AS l_discount_scaled
FROM lineitem, s
"""


def q_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation (scalers.py fit_imputer/apply_imputer)
    over deterministically-planted NULLs: numeric mean fill + most-
    frequent categorical fill with the (-count, value) struct-min
    tie-break.  Fits are aggregated-key-sized; fills inline as
    literals."""
    from ..operators.scalers import apply_imputer, fit_imputer

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 7 != 0, F.col("value")).alias("value2"),
        F.when(F.col("event_id") % 11 != 0, F.col("event_type")).alias("etype2"),
    )
    stats = fit_imputer(ev, num_cols=["value2"], cat_cols=["etype2"])
    out = apply_imputer(ev, stats)
    return out.select(
        "event_id",
        F.round("value2", 6).alias("value_imp"),
        F.col("etype2").alias("etype_imp"),
    )


SQL_IMPUTE = """
WITH base AS (
  SELECT event_id,
         CASE WHEN event_id % 7 <> 0 THEN value END AS value2,
         CASE WHEN event_id % 11 <> 0 THEN event_type END AS etype2
  FROM events
),
m AS (SELECT avg(value2) AS fv FROM base),
c AS (
  SELECT etype2 AS v, count(*) AS n FROM base
  WHERE etype2 IS NOT NULL GROUP BY etype2
),
top AS (SELECT v FROM c ORDER BY n DESC, v ASC LIMIT 1)
SELECT base.event_id,
       round(coalesce(base.value2, m.fv), 6) AS value_imp,
       coalesce(base.etype2, top.v) AS etype_imp
FROM base, m, top
"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile winsorization (scalers.py winsorize): clip two columns
    at their exact (p05, p95) — ONE melted percentile aggregation fits
    every bound, the clip is literal-inlined codegen.  Spark
    `percentile` == DuckDB quantile_cont (linear interpolation)."""
    from ..operators.scalers import winsorize

    li = load(spark, sf_dir, "lineitem", spread=True)
    out = winsorize(
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
        ["l_quantity", "l_extendedprice"],
        lower=0.05,
        upper=0.95,
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity_w", 6).alias("l_quantity_w"),
        F.round("l_extendedprice_w", 6).alias("l_extendedprice_w"),
    )


SQL_WINSORIZE = """
WITH q AS (
  SELECT quantile_cont(l_quantity, 0.05) AS lo1,
         quantile_cont(l_quantity, 0.95) AS hi1,
         quantile_cont(l_extendedprice, 0.05) AS lo2,
         quantile_cont(l_extendedprice, 0.95) AS hi2
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       round(CASE WHEN l_quantity IS NOT NULL
              THEN least(greatest(l_quantity, lo1), hi1) END, 6)
         AS l_quantity_w,
       round(CASE WHEN l_extendedprice IS NOT NULL
              THEN least(greatest(l_extendedprice, lo2), hi2) END, 6)
         AS l_extendedprice_w
FROM lineitem, q
"""


def q_mi_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information feature ranking (operators/mi.py mi_scores):
    event_type + a coarse value bin vs a deterministic 3-class target —
    every feature melts into ONE joint-count groupBy; marginals and the
    MI sum reduce over the aggregated cell table, never the input."""
    from ..operators.mi import mi_scores

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") / 50.0).cast("long").alias("value_bin"),
        (F.col("event_id") % 3).alias("y"),
    )
    out = mi_scores(ev, ["event_type", "value_bin"], target="y")
    return out.select("feature", F.round("mi", 6).alias("mi"))


SQL_MI_SCORES = """
WITH base AS (
  SELECT event_type,
         CAST(floor(value / 50.0) AS BIGINT) AS value_bin,
         event_id % 3 AS y
  FROM events
),
m AS (
  SELECT 'event_type' AS feat, event_type AS val, y FROM base WHERE y IS NOT NULL
  UNION ALL
  SELECT 'value_bin', CAST(value_bin AS VARCHAR), y FROM base WHERE y IS NOT NULL
),
j AS (SELECT feat, val, y, count(*) AS nxy FROM m GROUP BY feat, val, y),
c AS (
  SELECT nxy, feat,
         sum(nxy) OVER (PARTITION BY feat) AS n,
         sum(nxy) OVER (PARTITION BY feat, val) AS nx,
         sum(nxy) OVER (PARTITION BY feat, y) AS ny
  FROM j
)
SELECT feat AS feature,
       round(sum((nxy * 1.0 / n) * ln((nxy * 1.0 * n) / (nx * 1.0 * ny))), 6)
         AS mi
FROM c GROUP BY feat
"""


_QT_B = 20
_QT_PROBS = ", ".join(repr(i / _QT_B) for i in range(_QT_B + 1))


def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile transform to normal (operators/mi.py
    quantile_transform, output='normal'): a 20-edge exact-percentile
    grid fitted in one melted agg, applied as literal binary-search +
    linear interpolation + the Acklam probit — pure codegen, NO global
    sort (the percent_rank trap).  The oracle replays the grid
    interpolation AND the probit from the same coefficients
    (mi.probit_sql)."""
    from ..operators.mi import quantile_transform

    ev = load(spark, sf_dir, "events", spread=True)
    out = quantile_transform(
        ev, ["value"], n_quantiles=_QT_B, output="normal"
    )
    return out.select(
        "event_id", F.round("value_q", 6).alias("value_q")
    )


def _sql_quantile_norm() -> str:
    from ..operators.mi import probit_sql

    eps = 1.0 / (2.0 * _QT_B)
    rank = f"least(greatest(r.rank, {eps!r}), {1 - eps!r})"
    return f"""
WITH e AS (
  SELECT quantile_cont(value, [{_QT_PROBS}]) AS ed FROM events
),
b AS (SELECT unnest(generate_series(1, {_QT_B})) AS i),
r AS (
  SELECT ev.event_id,
         least(greatest(sum(
           CASE WHEN e.ed[b.i + 1] > e.ed[b.i]
                THEN least(greatest((ev.value - e.ed[b.i])
                                    / (e.ed[b.i + 1] - e.ed[b.i]), 0.0), 1.0)
                     / {float(_QT_B)!r}
                WHEN ev.value >= e.ed[b.i] THEN {1.0 / _QT_B!r}
                ELSE 0.0 END), 0.0), 1.0) AS rank
  FROM events ev, e, b
  WHERE ev.value IS NOT NULL
  GROUP BY ev.event_id
)
SELECT ev.event_id,
       -- `+ 0` folds round()'s -0.0 into +0.0 (driver hash parity)
       round({probit_sql(rank)}, 6) + 0 AS value_q
FROM events ev LEFT JOIN r ON ev.event_id = r.event_id
"""


SQL_QUANTILE_NORM = _sql_quantile_norm()


def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid resampling (operators/resample.py resample_grid):
    events onto a dense per-user 6h grid, last-value buckets,
    forward-filled.  Aggregation shuffles cells not events; the grid
    generates distributedly via sequence()+explode; ffill is one
    (user, bucket) sort."""
    from ..operators.resample import resample_grid

    ev = load(spark, sf_dir, "events", spread=True)
    out = resample_grid(
        ev, "value", step_s=21600, keys="user_id", ts_col="ts",
        agg="last", ffill=True,
    )
    return out.select(
        "user_id",
        (F.unix_micros("bucket_ts") / F.lit(1_000_000)).cast("long").alias("bucket_s"),
        F.round("value_last", 6).alias("value_last"),
        "n_events",
    )


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time-grain rollup (operators/resample.py
    time_rollup): per-user hour/day/week aggregates where the base
    table is scanned ONCE — day merges hour partials, week merges day
    partials.  The oracle recomputes every grain directly from the
    base table, so value equality proves the partial-merge path."""
    from ..operators.resample import time_rollup

    ev = load(spark, sf_dir, "events")
    out = time_rollup(
        ev,
        [("value", "sum"), ("value", "avg"), ("value", "count"),
         ("value", "min")],
        grains=("hour", "day", "week"), keys="user_id", ts_col="ts",
    )
    return out.select(
        "user_id", "grain",
        (F.unix_micros("bucket_ts") / F.lit(1_000_000)).cast("long")
        .alias("bucket_s"),
        F.round("value_sum", 6).alias("value_sum"),
        F.round("value_avg", 6).alias("value_avg"),
        "value_count",
        F.round("value_min", 6).alias("value_min"),
        "n_events",
    )


def _sql_time_rollup() -> str:
    grain_sql = """
SELECT user_id, '{g}' AS grain,
       CAST(epoch_us(date_trunc('{g}', ts)) / 1000000 AS BIGINT) AS bucket_s,
       round(sum(value), 6) AS value_sum,
       round(avg(value), 6) AS value_avg,
       count(value) AS value_count,
       round(min(value), 6) AS value_min,
       count(*) AS n_events
FROM events GROUP BY 1, 3"""
    return "\nUNION ALL\n".join(
        grain_sql.format(g=g) for g in ("hour", "day", "week")
    )


SQL_TIME_ROLLUP = _sql_time_rollup()


def q_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct rollup (operators/resample.py distinct_rollup):
    per-day and per-week distinct users, the week sketch merged from
    day sketches.  The estimate is approximate BY DESIGN, so the gate
    contract is the part an oracle can check exactly: the exact
    distinct counts + n_events (SQL-replayable) and a deterministic
    within-5% flag on the sketch estimate (HLL at lg_k=12 has ~1.6%
    standard error and is a pure function of the value set, so the
    flag is stable for a fixed input)."""
    from ..operators.resample import distinct_rollup

    ev = load(spark, sf_dir, "events")
    est = distinct_rollup(
        ev, "user_id", grains=("day", "week"), keys=(), ts_col="ts",
    )
    exact = None
    for g in ("day", "week"):
        e = ev.groupBy(F.date_trunc(g, "ts").alias("bucket_ts")).agg(
            F.countDistinct("user_id").alias("n_exact")
        ).withColumn("grain", F.lit(g))
        exact = e if exact is None else exact.unionByName(e)
    j = est.join(F.broadcast(exact), ["grain", "bucket_ts"])
    return j.select(
        "grain",
        (F.unix_micros("bucket_ts") / F.lit(1_000_000)).cast("long")
        .alias("bucket_s"),
        F.col("n_exact").cast("long").alias("n_exact"),
        "n_events",
        (
            (F.col("user_id_distinct") >= 0.95 * F.col("n_exact"))
            & (F.col("user_id_distinct") <= 1.05 * F.col("n_exact"))
        ).alias("within_5pct"),
    )


def _sql_distinct_rollup() -> str:
    grain_sql = """
SELECT '{g}' AS grain,
       CAST(epoch_us(date_trunc('{g}', ts)) / 1000000 AS BIGINT) AS bucket_s,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       count(*) AS n_events,
       TRUE AS within_5pct
FROM events GROUP BY 1, 2"""
    return "\nUNION ALL\n".join(
        grain_sql.format(g=g) for g in ("day", "week")
    )


SQL_DISTINCT_ROLLUP = _sql_distinct_rollup()


SQL_RESAMPLE = """
WITH b AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts) / 21600000000) AS BIGINT) AS bk,
         epoch_us(ts) AS us, value
  FROM events
),
cells AS (
  SELECT user_id, bk,
         max(CASE WHEN value IS NOT NULL
                  THEN struct_pack(u := us, v := value) END).v AS v,
         count(*) AS n
  FROM b GROUP BY user_id, bk
),
span AS (SELECT user_id, min(bk) AS lo, max(bk) AS hi FROM cells GROUP BY user_id),
grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS bk FROM span),
j AS (
  SELECT g.user_id, g.bk, c.v, coalesce(c.n, 0) AS n
  FROM grid g LEFT JOIN cells c ON g.user_id = c.user_id AND g.bk = c.bk
)
SELECT user_id,
       CAST(bk * 21600 AS BIGINT) AS bucket_s,
       round(last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bk
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_last,
       CAST(n AS BIGINT) AS n_events
FROM j
"""


def q_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) CV splits (operators/cv.py):
    5 equal-count time segments from one percentile fit; every row's
    (segment, test_fold) is a literal-comparison codegen expression —
    train = strictly earlier segments, so no feature fit ever sees its
    test window."""
    from ..operators.cv import rolling_origin_folds

    ev = load(spark, sf_dir, "events", spread=True)
    out = rolling_origin_folds(ev, n_folds=5, ts_col="ts", min_train_folds=1)
    return out.select(
        "event_id",
        F.col("segment").cast("long").alias("segment"),
        F.col("test_fold").cast("double").alias("test_fold"),
    )


SQL_CV_FOLDS = """
WITH e AS (
  SELECT quantile_cont(epoch_us(ts), [0.2, 0.4, 0.6, 0.8]) AS ed FROM events
),
s AS (
  SELECT event_id,
         (CASE WHEN epoch_us(ts) >= ed[1] THEN 1 ELSE 0 END
        + CASE WHEN epoch_us(ts) >= ed[2] THEN 1 ELSE 0 END
        + CASE WHEN epoch_us(ts) >= ed[3] THEN 1 ELSE 0 END
        + CASE WHEN epoch_us(ts) >= ed[4] THEN 1 ELSE 0 END) AS segment
  FROM events, e
)
SELECT event_id, CAST(segment AS BIGINT) AS segment,
       CAST(CASE WHEN segment >= 1 THEN segment END AS DOUBLE) AS test_fold
FROM s
"""


def q_purged_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged K-fold with a 1-day embargo (operators/cv.py
    purged_kfold): contiguous time folds; per test fold k the train_k
    mask drops rows inside the fold OR within the embargo of its
    boundaries — forward label horizons cannot leak across.  Pure
    literal comparisons, zero shuffle."""
    from ..operators.cv import purged_kfold

    ev = load(spark, sf_dir, "events")
    out = purged_kfold(ev, n_folds=3, ts_col="ts", embargo_s=86400.0)
    return out.select(
        "event_id",
        F.col("fold").cast("long").alias("fold"),
        "train_0", "train_1", "train_2",
    )


SQL_PURGED_FOLDS = """
WITH e AS (
  SELECT quantile_cont(epoch_us(ts), [1.0/3, 2.0/3]) AS ed FROM events
),
s AS (
  SELECT event_id, CAST(epoch_us(ts) AS DOUBLE) AS us,
         (CASE WHEN epoch_us(ts) >= ed[1] THEN 1 ELSE 0 END
        + CASE WHEN epoch_us(ts) >= ed[2] THEN 1 ELSE 0 END) AS fold,
         ed[1] AS e1, ed[2] AS e2
  FROM events, e
)
SELECT event_id, CAST(fold AS BIGINT) AS fold,
       fold <> 0 AND NOT (us >= e1 AND us < e1 + 86400000000.0) AS train_0,
       fold <> 1 AND NOT (us >= e1 - 86400000000.0 AND us < e1)
                AND NOT (us >= e2 AND us < e2 + 86400000000.0) AS train_1,
       fold <> 2 AND NOT (us >= e2 - 86400000000.0 AND us < e2) AS train_2
FROM s
"""


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling (operators/negatives.py): two
    hash-derived negatives per distinct (supplier, part) positive —
    the j-th negative is a pure function of (entity, item, j, seed),
    so results are identical on any cluster size.  Dense item index on
    the broadcast DIMENSION table; one anti-join removes accidental
    positives.  Gate uses hash_fn='md5_60' for the SQL replay."""
    from ..operators.negatives import negative_samples

    li = load(spark, sf_dir, "lineitem", spread=True)
    part = load(spark, sf_dir, "part").select("p_partkey")
    pos = li.select(
        "l_suppkey", F.col("l_partkey").alias("p_partkey")
    ).distinct()
    out = negative_samples(
        pos, part, k=2, entity_col="l_suppkey", item_col="p_partkey",
        seed=42, hash_fn="md5_60",
    )
    return out.select(
        "l_suppkey", "pos_item", F.col("j").cast("long").alias("j"), "neg_item"
    )


SQL_NEGATIVE_SAMPLES = """
WITH idx AS (
  SELECT p_partkey AS neg_item,
         row_number() OVER (ORDER BY p_partkey) - 1 AS i
  FROM part
),
n AS (SELECT count(*) AS n FROM part),
pos AS (SELECT DISTINCT l_suppkey AS ent, l_partkey AS itm FROM lineitem),
cand AS (
  SELECT ent, itm, j,
         ('0x' || substr(md5(concat_ws(chr(31),
            CAST(ent AS VARCHAR), CAST(itm AS VARCHAR),
            CAST(j AS VARCHAR), '42')), 1, 15))::BIGINT % n.n AS i
  FROM pos, unnest([0, 1]) AS t(j), n
)
SELECT c.ent AS l_suppkey, c.itm AS pos_item,
       CAST(c.j AS BIGINT) AS j, x.neg_item
FROM cand c JOIN idx x ON c.i = x.i
WHERE NOT EXISTS (
  SELECT 1 FROM pos p WHERE p.ent = c.ent AND p.itm = x.neg_item
)
"""


def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/quality_checks.py):
    five expectation rules — null rate, range, accepted values,
    uniqueness, row count — ALL compiled into ONE aggregation job over
    ONE scan; the output is the tiny (rule, column, metric, threshold,
    passed) frame a checkpoint hook asserts on."""
    from ..operators.quality_checks import (
        accepted_values, in_range, min_rows, not_null, unique, validate,
    )

    ev = load(spark, sf_dir, "events")
    out = validate(
        ev,
        [
            not_null("value"),
            in_range("value", 0.0, 400.0, max_violation_rate=0.05),
            accepted_values(
                "event_type",
                ["click", "view", "purchase", "signup", "error"],
            ),
            unique("event_id"),
            min_rows(1000),
        ],
    )
    return out.select(
        "rule", "column", F.round("metric", 6).alias("metric"),
        "threshold", "passed",
    )


SQL_QUALITY_CHECKS = """
WITH t AS (
  SELECT count(*) AS total,
         count(value) AS nn_v,
         sum(CASE WHEN value < 0.0 OR value > 400.0 THEN 1 ELSE 0 END) AS oor,
         count(event_type) AS nn_e,
         sum(CASE WHEN event_type NOT IN
             ('click', 'view', 'purchase', 'signup', 'error')
             THEN 1 ELSE 0 END) AS bad_e,
         count(DISTINCT event_id) AS d_id
  FROM events
)
SELECT 'not_null' AS rule, 'value' AS "column",
       round((total - nn_v) * 1.0 / total, 6) AS metric, 0.0 AS threshold,
       (total - nn_v) * 1.0 / total <= 0.0 AS passed FROM t
UNION ALL
SELECT 'in_range', 'value',
       round(coalesce(oor * 1.0 / nn_v, 0.0), 6), 0.05,
       coalesce(oor * 1.0 / nn_v, 0.0) <= 0.05 FROM t
UNION ALL
SELECT 'accepted_values', 'event_type',
       round(coalesce(bad_e * 1.0 / nn_e, 0.0), 6), 0.0,
       coalesce(bad_e * 1.0 / nn_e, 0.0) <= 0.0 FROM t
UNION ALL
SELECT 'unique', 'event_id',
       round((total - d_id) * 1.0 / total, 6), 0.0,
       (total - d_id) * 1.0 / total <= 0.0 FROM t
UNION ALL
SELECT 'min_rows', '*', CAST(total AS DOUBLE), 1000.0,
       total >= 1000 FROM t
"""


def _isotonic_fit_points():
    # deterministic sf-independent fit input: x_i = i/200, pseudo-label
    # from pure integer arithmetic (Knuth-hash mod vs a linear ramp) —
    # exactly computable in Spark AND in the oracle builder
    xs = [i / 200.0 for i in range(200)]
    ys = [1 if (i * 2654435761) % 1000 < 100 + 4 * i else 0 for i in range(200)]
    return xs, ys


def q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration (operators/calibration.py fit_isotonic /
    apply_isotonic): PAV over aggregated score bins (driver math over
    n_bins rows — the ChiMerge/driver_fit pattern), applied as a pure
    literal-array lookup.  Fit input is a deterministic synthetic ramp
    (literal-replay: the oracle inlines the same fitted values via the
    pure-Python twin isotonic_fit_points, asserted equal in tests)."""
    from ..operators.calibration import apply_isotonic, fit_isotonic

    fitd = spark.range(200).select(
        (F.col("id") / 200.0).alias("s"),
        (
            (F.col("id") * 2654435761) % 1000 < 100 + 4 * F.col("id")
        ).cast("int").alias("y"),
    )
    model = fit_isotonic(fitd, "s", "y", n_bins=64)
    ev = load(spark, sf_dir, "events").withColumn(
        "score", F.least(F.col("value") / 500.0, F.lit(0.98))
    )
    out = apply_isotonic(ev, model, "score")
    return out.select(
        "event_id",
        F.round("score", 6).alias("score"),
        F.round("score_cal", 6).alias("score_cal"),
    )


def _sql_isotonic() -> str:
    from ..operators.calibration import isotonic_fit_points

    xs, ys = _isotonic_fit_points()
    m = isotonic_fit_points(xs, ys, n_bins=64)
    vals = ", ".join(repr(v) for v in m["values"])
    lo, width, n = m["lo"], (m["hi"] - m["lo"]) or 1.0, m["n_bins"]
    return f"""
WITH s AS (
  SELECT event_id, least(value / 500.0, 0.98) AS score FROM events
)
SELECT event_id, round(score, 6) AS score,
       round(CASE WHEN score IS NOT NULL THEN CAST(
         ([{vals}])[
           CAST(least(greatest(floor((CAST(score AS DOUBLE) - {lo!r})
                                     / {width!r} * {n}), 0), {n - 1}) AS INT)
           + 1
         ] AS DOUBLE) END, 6) AS score_cal
FROM s
"""


SQL_ISOTONIC = _sql_isotonic()


def q_dist_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample distances (operators/calibration.py
    distribution_distance): PSI + KS + Jensen-Shannon + total variation
    between the even/odd event halves over the EXPECTED side's 10-bin
    step grid (the metrics.psi leakage-safe binning rule).  Two 10-row
    count aggregations; every distance is driver math over the counts."""
    from ..operators.calibration import distribution_distance

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    expected = ev.where(F.col("event_id") % 2 == 0)
    actual = ev.where(F.col("event_id") % 2 == 1)
    d = distribution_distance(expected, actual, "value", n_bins=10)
    return spark.createDataFrame(
        [(
            round(d["psi"], 6), round(d["ks"], 6), round(d["jsd"], 6),
            round(d["tvd"], 6), d["n_expected"], d["n_actual"],
        )],
        "psi double, ks double, jsd double, tvd double, "
        "n_expected bigint, n_actual bigint",
    )


SQL_DIST_DISTANCE = """
WITH s AS (SELECT min(value) mn, max(value) mx FROM events
           WHERE event_id % 2 = 0 AND value IS NOT NULL),
eb AS (
  SELECT CAST(least(greatest(ceil((e.value - s.mn) / ((s.mx - s.mn) / 10.0)), 1), 10) - 1 AS INT) AS b
  FROM events e, s WHERE e.event_id % 2 = 0 AND e.value IS NOT NULL
),
ab AS (
  SELECT CAST(least(greatest(ceil((e.value - s.mn) / ((s.mx - s.mn) / 10.0)), 1), 10) - 1 AS INT) AS b
  FROM events e, s WHERE e.event_id % 2 = 1 AND e.value IS NOT NULL
),
ec AS (SELECT b, count(*) c FROM eb GROUP BY b),
ac AS (SELECT b, count(*) c FROM ab GROUP BY b),
keys AS (SELECT CAST(range AS INT) AS b FROM range(0, 10)),
r AS (
  SELECT k.b,
         greatest(coalesce(ec.c, 0) * 1.0 / (SELECT sum(c) FROM ec), 1e-10) er,
         greatest(coalesce(ac.c, 0) * 1.0 / (SELECT sum(c) FROM ac), 1e-10) ar
  FROM keys k LEFT JOIN ec ON k.b = ec.b LEFT JOIN ac ON k.b = ac.b
),
c AS (
  SELECT b, er, ar,
         sum(er) OVER (ORDER BY b) AS ce,
         sum(ar) OVER (ORDER BY b) AS ca
  FROM r
)
SELECT round(sum((ar - er) * ln(ar / er)), 6) AS psi,
       round(max(abs(ce - ca)), 6) AS ks,
       round(sum(0.5 * (er * ln(er / ((er + ar) / 2.0))
                      + ar * ln(ar / ((er + ar) / 2.0)))), 6) AS jsd,
       round(0.5 * sum(abs(ar - er)), 6) AS tvd,
       CAST((SELECT sum(c) FROM ec) AS BIGINT) AS n_expected,
       CAST((SELECT sum(c) FROM ac) AS BIGINT) AS n_actual
FROM c
"""


def q_drift_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-period drift report (operators/calibration.py
    drift_timeline): weekly PSI/KS/JSD/TVD of the odd event half
    against the even half's distribution — the whole timeline in one
    distributed plan (two aggregation passes over the actual stream),
    exactly SQL-replayed including the edge fit."""
    from ..operators.calibration import drift_timeline

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    expected = ev.where(F.col("event_id") % 2 == 0)
    actual = ev.where(F.col("event_id") % 2 == 1)
    out = drift_timeline(expected, actual, "value", period="week",
                         n_bins=10, ts_col="ts")
    return out.select(
        (F.unix_micros("period_ts") / F.lit(1_000_000)).cast("long")
        .alias("period_s"),
        "n",
        F.round("psi", 6).alias("psi"),
        F.round("ks", 6).alias("ks"),
        F.round("jsd", 6).alias("jsd"),
        F.round("tvd", 6).alias("tvd"),
    )


SQL_DRIFT_TIMELINE = """
WITH s AS (SELECT min(value) mn, max(value) mx FROM events
           WHERE event_id % 2 = 0 AND value IS NOT NULL),
eb AS (
  SELECT CAST(least(greatest(ceil((e.value - s.mn) / ((s.mx - s.mn) / 10.0)), 1), 10) - 1 AS INT) AS b
  FROM events e, s WHERE e.event_id % 2 = 0 AND e.value IS NOT NULL
),
ab AS (
  SELECT CAST(epoch_us(date_trunc('week', e.ts)) / 1000000 AS BIGINT) AS period_s,
         CAST(least(greatest(ceil((e.value - s.mn) / ((s.mx - s.mn) / 10.0)), 1), 10) - 1 AS INT) AS b
  FROM events e, s WHERE e.event_id % 2 = 1 AND e.value IS NOT NULL
),
ec AS (SELECT b, count(*) c FROM eb GROUP BY b),
ac AS (SELECT period_s, b, count(*) c FROM ab GROUP BY 1, 2),
periods AS (SELECT period_s, CAST(sum(c) AS BIGINT) n FROM ac GROUP BY 1),
keys AS (SELECT CAST(range AS INT) AS b FROM range(0, 10)),
r AS (
  SELECT p.period_s, p.n, k.b,
         greatest(coalesce(ec.c, 0) * 1.0 / (SELECT sum(c) FROM ec), 1e-10) er,
         greatest(coalesce(ac.c, 0) * 1.0 / p.n, 1e-10) ar
  FROM periods p CROSS JOIN keys k
  LEFT JOIN ec ON k.b = ec.b
  LEFT JOIN ac ON ac.period_s = p.period_s AND ac.b = k.b
),
c AS (
  SELECT period_s, n, er, ar,
         abs(sum(er) OVER w - sum(ar) OVER w) AS gap
  FROM r
  WINDOW w AS (PARTITION BY period_s ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT period_s, n,
       round(sum((ar - er) * ln(ar / er)), 6) AS psi,
       round(max(gap), 6) AS ks,
       round(sum(0.5 * (er * ln(er / ((er + ar) / 2.0))
                      + ar * ln(ar / ((er + ar) / 2.0)))), 6) AS jsd,
       round(0.5 * sum(abs(ar - er)), 6) AS tvd
FROM c GROUP BY period_s, n
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment join (operators/temporal.py interval_join): every
    event inside the 30-minute window after an error by the same user
    — intervals exploded onto fixed-width buckets so the theta join
    becomes an equi-join plus residual filter; the oracle runs the raw
    theta join, so a value match proves the bucketing misses nothing
    and duplicates nothing."""
    from ..operators.temporal import interval_join

    ev = load(spark, sf_dir, "events")
    iv = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1800 SECONDS")).alias("end_ts"),
    )
    out = interval_join(
        ev.select("user_id", "event_id", "ts"), iv,
        keys="user_id", bucket_seconds=1800,
    )
    return out.select("event_id", "err_id", "user_id")


SQL_INTERVAL_JOIN = """
SELECT p.event_id, e.err_id, p.user_id
FROM events p
JOIN (
  SELECT user_id, event_id AS err_id, ts AS start_ts,
         ts + INTERVAL 1800 SECONDS AS end_ts
  FROM events WHERE event_type = 'error'
) e
ON p.user_id = e.user_id AND p.ts >= e.start_ts AND p.ts <= e.end_ts
"""


def q_seq_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence n-grams (operators/seq_features.py seq_ngrams):
    corpus-level counts of per-user event-type 3-grams, long tail
    pruned at min_count=2 — one lag window sharing the key sort, one
    map-side-combined groupBy."""
    from ..operators.seq_features import seq_ngrams

    ev = load(spark, sf_dir, "events")
    return seq_ngrams(
        ev, "event_type", n=3, keys="user_id", order=("ts", "event_id"),
        per_key=False, min_count=2,
    )


SQL_SEQ_NGRAMS = """
WITH l AS (
  SELECT event_type AS g3,
         lag(event_type, 1) OVER w AS g2,
         lag(event_type, 2) OVER w AS g1,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT g1, g2, g3, CAST(count(*) AS BIGINT) AS n
FROM l WHERE rn >= 3 GROUP BY 1, 2, 3 HAVING count(*) >= 2
"""


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point statistics (operators/ts_features.py
    with_cusum): per-user two-sided Page recursions against a fixed
    reference mean, computed as four running window aggregates via the
    reset-at-zero linearization — the oracle replays the same
    cumsum-minus-running-min windows in SQL."""
    from ..operators.ts_features import with_cusum

    ev = load(spark, sf_dir, "events")
    out = with_cusum(
        ev, "value", target=50.0, slack=5.0, threshold=200.0,
        keys="user_id", order=("ts", "event_id"),
    )
    return out.select(
        "event_id", "user_id",
        F.round("value_cusum_pos", 6).alias("cusum_pos"),
        F.round("value_cusum_neg", 6).alias("cusum_neg"),
        F.col("value_cusum_alarm").alias("alarm"),
    )


SQL_CUSUM = """
WITH s AS (
  SELECT event_id, user_id, ts,
         sum(coalesce(value - 55.0, 0.0)) OVER wc AS sp,
         sum(coalesce(-(value - 45.0), 0.0)) OVER wc AS sn
  FROM events
  WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
m AS (
  SELECT event_id, user_id,
         sp - least(0.0, min(sp) OVER wc) AS pos,
         sn - least(0.0, min(sn) OVER wc) AS neg
  FROM s
  WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       round(pos, 6) AS cusum_pos,
       round(neg, 6) AS cusum_neg,
       (pos > 200.0 OR neg > 200.0) AS alarm
FROM m
"""


def q_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (operators/cohort.py): weekly first-seen
    cohorts x whole-week age, distinct-active counts and retention
    rates — the stream reduces once to (user, week) rows, everything
    downstream is aggregation over that table."""
    from ..operators.cohort import cohort_retention

    ev = load(spark, sf_dir, "events")
    out = cohort_retention(ev, key="user_id", ts_col="ts", grain="week")
    return out.select(
        (F.unix_micros("cohort_ts") / F.lit(1_000_000)).cast("long")
        .alias("cohort_s"),
        "age", "n_active", "n_cohort",
        F.round("retention", 6).alias("retention"),
    )


SQL_COHORT = """
WITH act AS (
  SELECT user_id AS k,
         CAST(epoch_us(date_trunc('week', ts)) / 1000000 AS BIGINT) AS p
  FROM events GROUP BY 1, 2
),
coh AS (SELECT k, min(p) AS c FROM act GROUP BY k),
cells AS (
  SELECT coh.c AS cohort_s,
         CAST((act.p - coh.c) / 604800 AS INT) AS age,
         count(*) AS n_active
  FROM act JOIN coh ON act.k = coh.k
  GROUP BY 1, 2
),
sizes AS (SELECT c AS cohort_s, count(*) AS n_cohort FROM coh GROUP BY c)
SELECT cells.cohort_s, cells.age, cells.n_active, sizes.n_cohort,
       round(cells.n_active * 1.0 / sizes.n_cohort, 6) AS retention
FROM cells JOIN sizes USING (cohort_s)
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel (operators/funnel.py): per user, the
    earliest in-order view -> click -> purchase completion within 7
    days of the first view — one window cascade and the per-user
    rollup on a single hash exchange (plan-asserted in
    tests/test_funnel.py).  Nullable step timestamps go out as double
    epoch seconds per the registry dtype convention."""
    from ..operators.funnel import funnel

    ev = load(spark, sf_dir, "events")
    out = funnel(
        ev,
        [("view", F.col("event_type") == "view"),
         ("click", F.col("event_type") == "click"),
         ("purchase", F.col("event_type") == "purchase")],
        keys="user_id", order=("ts", "event_id"), ts_col="ts",
        horizon_s=604800,
    )
    # raw step timestamps are TIMESTAMP_NTZ (testdata convention);
    # cast to TIMESTAMP for unix_micros — session tz is pinned UTC
    sec = lambda c: F.round(  # noqa: E731
        F.unix_micros(c.cast("timestamp")) / F.lit(1_000_000), 6
    )
    return out.select(
        "user_id",
        sec(F.col("view_ts")).alias("view_s"),
        sec(F.col("click_ts")).alias("click_s"),
        sec(F.col("purchase_ts")).alias("purchase_s"),
        F.col("depth").cast("bigint").alias("depth"),
    )


SQL_FUNNEL = """
WITH b AS (
  SELECT *, date_diff('second', TIMESTAMP '1970-01-01', ts) AS ep FROM events
),
r1 AS (
  SELECT *,
         min(CASE WHEN event_type = 'view' THEN ep END) OVER wc AS run1,
         min(CASE WHEN event_type = 'view' THEN ep END) OVER wp AS run1p
  FROM b
  WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
r2 AS (
  SELECT *,
         min(CASE WHEN event_type = 'click' AND run1p IS NOT NULL
                   AND ep <= run1p + 604800 THEN ep END) OVER wc AS run2,
         min(CASE WHEN event_type = 'click' AND run1p IS NOT NULL
                   AND ep <= run1p + 604800 THEN ep END) OVER wp AS run2p
  FROM r1
  WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
r3 AS (SELECT * FROM r2)
-- the group min of each step's qualifying raw timestamps equals the
-- running-min's final value (raw ts ordering refines the truncated
-- ep ordering the conditions gate on)
SELECT user_id,
       round(epoch_us(min(CASE WHEN event_type = 'view' THEN ts END))
             / 1000000.0, 6) AS view_s,
       round(epoch_us(min(CASE WHEN event_type = 'click'
                           AND run1p IS NOT NULL
                           AND ep <= run1p + 604800 THEN ts END))
             / 1000000.0, 6) AS click_s,
       round(epoch_us(min(CASE WHEN event_type = 'purchase'
                           AND run2p IS NOT NULL
                           AND ep <= run1p + 604800 THEN ts END))
             / 1000000.0, 6) AS purchase_s,
       CAST((min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL)::INT
          + (min(CASE WHEN event_type = 'click' AND run1p IS NOT NULL
                  AND ep <= run1p + 604800 THEN ts END) IS NOT NULL)::INT
          + (min(CASE WHEN event_type = 'purchase' AND run2p IS NOT NULL
                  AND ep <= run1p + 604800 THEN ts END) IS NOT NULL)::INT
          AS BIGINT) AS depth
FROM r3 GROUP BY user_id
"""


_GROUP_MODEL_TYPES = ("click", "error", "purchase", "signup", "view")


def _group_model_fit_rows():
    """Deterministic sf-independent per-group fit input (the isotonic
    synthetic-ramp pattern): integer arithmetic only, so Spark and the
    pure-python twin construct the identical multiset."""
    rows = []
    for gi, t in enumerate(_GROUP_MODEL_TYPES):
        for i in range(240):
            x1 = i / 240.0
            x2 = ((i * 37) % 240) / 240.0
            y = 1 if (i * 2654435761) % 997 < 100 + (gi + 1) * 2 * i else 0
            rows.append((t, x1, x2, y))
    return rows


def q_group_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment logistic models (operators/group_models.py): one
    model per event_type fit via the applyInPandas kernel on the
    deterministic synthetic ramp, then applied to the events table as
    a pure-codegen broadcast-join dot product.  The oracle inlines the
    pure-python twin's fitted weights (fit_logistic_arrays — asserted
    bit-identical to the kernel in tests/test_group_models.py), so a
    value match proves fit AND apply."""
    from ..operators.group_models import (
        apply_group_models,
        fit_logistic_per_group,
    )

    fitd = spark.createDataFrame(
        _group_model_fit_rows(), "g string, x1 double, x2 double, y int"
    )
    models = fit_logistic_per_group(
        fitd, ["x1", "x2"], "y", group_cols="g",
    ).withColumnRenamed("g", "event_type")
    ev = load(spark, sf_dir, "events", spread=True).where(
        F.col("value").isNotNull()
    ).select(
        "event_id", "event_type",
        (F.col("value") / 500.0).alias("x1"),
        (F.pmod(F.col("user_id"), 10) / 10.0).alias("x2"),
    )
    out = apply_group_models(
        ev, models, ["x1", "x2"], group_cols="event_type",
    )
    return out.select(
        "event_id", "event_type", F.round("score", 6).alias("score")
    )


def _sql_group_models() -> str:
    from ..operators.group_models import fit_logistic_arrays

    rows = _group_model_fit_rows()
    cases = []
    for t in _GROUP_MODEL_TYPES:
        X = [(r[1], r[2]) for r in rows if r[0] == t]
        y = [r[3] for r in rows if r[0] == t]
        w, b = fit_logistic_arrays(X, y)
        cases.append(
            f"WHEN event_type = '{t}' THEN {b!r} + {w[0]!r} * (value / 500.0)"
            f" + {w[1]!r} * ((user_id % 10) / 10.0)"
        )
    lin = "CASE " + " ".join(cases) + " END"
    return f"""
SELECT event_id, event_type,
       round(1.0 / (1.0 + exp(-({lin}))), 6) AS score
FROM events WHERE value IS NOT NULL
"""


SQL_GROUP_MODELS = _sql_group_models()

# ---------------------------------------------------------------- session 8:
# dimension builders, survival/experiment analytics, value segmentation


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build (operators/scd.py scd2_compress):
    per-user runs of identical event_type collapse to validity
    intervals [valid_from, valid_to) — the gaps-and-islands run id is
    one per-key window + one map-side-combined groupBy; the oracle
    replays the same lag/cumsum/lead chain in SQL."""
    from ..operators.scd import scd2_compress

    ev = load(spark, sf_dir, "events")
    out = scd2_compress(
        ev, "event_type", keys="user_id", order=("ts", "event_id"),
        ts_col="ts",
    )
    sec = lambda c: F.round(  # noqa: E731
        F.unix_micros(F.col(c).cast("timestamp")) / F.lit(1_000_000), 6
    )
    return out.select(
        "user_id", "event_type",
        sec("valid_from").alias("valid_from_s"),
        sec("valid_to").alias("valid_to_s"),
        "n_rows",
    )


SQL_SCD2 = """
WITH x AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_id) OVER w IS NULL THEN 1
              WHEN event_type IS DISTINCT FROM lag(event_type) OVER w THEN 1
              ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
r AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS run
  FROM x
),
runs AS (
  SELECT user_id, run, min(event_type) AS event_type,
         min(ts) AS valid_from, count(*) AS n_rows
  FROM r GROUP BY user_id, run
)
SELECT user_id, event_type,
       round(epoch_us(valid_from) / 1000000.0, 6) AS valid_from_s,
       round(epoch_us(lead(valid_from) OVER
               (PARTITION BY user_id ORDER BY run)) / 1000000.0, 6)
         AS valid_to_s,
       n_rows
FROM runs
"""


def q_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot compaction (operators/scd.py snapshot_latest):
    latest record per (user, event_type) via ONE max_by aggregation —
    map-side combined, so the exchange carries one row per key per
    mapper instead of full history; the oracle is the textbook
    row_number()-desc = 1."""
    from ..operators.scd import snapshot_latest

    ev = load(spark, sf_dir, "events", spread=True)
    out = snapshot_latest(
        ev, keys=("user_id", "event_type"), order=("ts", "event_id")
    )
    return out.select(
        "user_id", "event_type",
        F.col("event_id").alias("last_event_id"),
        F.round(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000), 6)
        .alias("last_ts_s"),
        F.round("value", 6).alias("last_value"),
    )


SQL_SNAPSHOT = """
SELECT user_id, event_type, event_id AS last_event_id,
       round(epoch_us(ts) / 1000000.0, 6) AS last_ts_s,
       round(value, 6) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival (operators/survival.py): per user, hours
    from first event to first purchase (right-censored at the last
    event), curve per arm = user_id % 2.  The raw stream reduces once
    to per-user durations, then once more to per-(arm, duration)
    counts; the product-limit curve is windowed SQL on that tiny
    table, replayed verbatim by the oracle."""
    from ..operators.survival import kaplan_meier

    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "ev_ts"
        ),
        F.max("ts").alias("last_ts"),
    )
    per = per.select(
        (F.pmod(F.col("user_id"), F.lit(2))).cast("int").alias("arm"),
        F.floor(
            (
                F.unix_micros(
                    F.coalesce("ev_ts", "last_ts").cast("timestamp")
                )
                - F.unix_micros(F.col("first_ts").cast("timestamp"))
            )
            / F.lit(3_600_000_000)
        ).cast("long").alias("duration_h"),
        F.col("ev_ts").isNotNull().alias("observed"),
    )
    out = kaplan_meier(per, "duration_h", "observed", group_cols="arm")
    return out.select(
        "arm", F.col("duration").alias("duration_h"),
        "n_risk", "n_event", "n_censor",
        F.round("survival", 6).alias("survival"),
        F.round("std_err", 6).alias("std_err"),
    )


SQL_KAPLAN_MEIER = """
WITH per AS (
  SELECT CAST(user_id % 2 AS INT) AS arm,
         CAST(floor((epoch_us(coalesce(
                 min(CASE WHEN event_type = 'purchase' THEN ts END),
                 max(ts)))
               - epoch_us(min(ts))) / 3600000000.0) AS BIGINT) AS duration_h,
         (min(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL)
           AS observed
  FROM events GROUP BY user_id
),
cells AS (
  SELECT arm, duration_h AS duration,
         CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_event,
         CAST(sum(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT)
           AS n_censor
  FROM per GROUP BY arm, duration_h
),
risk AS (
  SELECT *,
         CAST(sum(n_event + n_censor) OVER (PARTITION BY arm)
              - (sum(n_event + n_censor) OVER wc - n_event - n_censor)
              AS BIGINT) AS n_risk
  FROM cells
  WINDOW wc AS (PARTITION BY arm ORDER BY duration
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
curve AS (
  SELECT *,
         min(1.0 - n_event * 1.0 / n_risk) OVER wc <= 0.0 AS hit_zero,
         sum(CASE WHEN n_event > 0 AND n_risk > n_event
                  THEN ln(1.0 - n_event * 1.0 / n_risk)
                  ELSE 0.0 END) OVER wc AS log_surv,
         sum(CASE WHEN n_event > 0 AND n_risk > n_event
                  THEN n_event * 1.0 / (n_risk * (n_risk - n_event))
                  ELSE 0.0 END) OVER wc AS green
  FROM risk
  WINDOW wc AS (PARTITION BY arm ORDER BY duration
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT arm, duration AS duration_h, n_risk, n_event, n_censor,
       round(CASE WHEN hit_zero THEN 0.0 ELSE exp(log_surv) END, 6)
         AS survival,
       round(CASE WHEN hit_zero THEN NULL
                  ELSE exp(log_surv) * sqrt(green) END, 6) AS std_err
FROM curve
"""


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED adjustment (operators/causal.py cuped_adjust): per-user
    post-period outcome adjusted by the pre-period covariate, split at
    the corpus time midpoint.  Fit = one tiny aggregation (theta,
    mean); transform = broadcast arithmetic; the oracle inlines the
    same covar_pop/var_pop fit in SQL."""
    from ..operators.causal import cuped_adjust

    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    # midpoint in integer epoch micros on BOTH engines — a timestamp
    # round-trip would differ by 1us between float/int conversions
    bounds = ev.agg(
        F.floor((F.min("__us") + F.max("__us")) / 2).cast("long").alias("mid")
    )
    per = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("__us") < F.col("mid"), F.col("value"))),
                F.lit(0.0),
            ).alias("x_pre"),
            F.coalesce(
                F.sum(F.when(F.col("__us") >= F.col("mid"), F.col("value"))),
                F.lit(0.0),
            ).alias("y_post"),
        )
    )
    out = cuped_adjust(per, "y_post", "x_pre")
    return out.select(
        "user_id",
        F.round("x_pre", 6).alias("x_pre"),
        F.round("y_post", 6).alias("y_post"),
        F.round("theta", 6).alias("theta"),
        F.round("y_post_cuped", 6).alias("y_cuped"),
    )


SQL_CUPED = """
WITH mid AS (
  SELECT CAST(floor((epoch_us(min(ts)) + epoch_us(max(ts))) / 2) AS BIGINT)
           AS m
  FROM events
),
per AS (
  SELECT user_id,
         coalesce(sum(CASE WHEN epoch_us(ts) < mid.m THEN value END), 0.0)
           AS x_pre,
         coalesce(sum(CASE WHEN epoch_us(ts) >= mid.m THEN value END), 0.0)
           AS y_post
  FROM events CROSS JOIN mid GROUP BY user_id
),
fit AS (
  SELECT CASE WHEN var_pop(x_pre) > 0
              THEN covar_pop(x_pre, y_post) / var_pop(x_pre)
              ELSE 0.0 END AS theta,
         avg(x_pre) AS mx
  FROM per
)
SELECT user_id, round(x_pre, 6) AS x_pre, round(y_post, 6) AS y_post,
       round(theta, 6) AS theta,
       round(y_post - theta * (x_pre - mx), 6) AS y_cuped
FROM per CROSS JOIN fit
"""


def q_ate_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified treatment effect (operators/causal.py
    ate_strata): md5-deterministic arm assignment, activity-bucket
    strata, per-stratum arm means + the size-weighted overall ATE in
    one aggregation over the per-user table."""
    from ..operators.causal import ate_strata

    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("value").alias("y"),
    )
    per = per.select(
        "y",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16, 10,
            ).cast("long") % 2 == 0
        ).alias("treat"),
        F.floor(F.col("n_events") / 20).cast("int").alias("bucket"),
    )
    out = ate_strata(per, "treat", "y", "bucket")
    return out.select(
        "stratum", "is_overall", "n", "n_treat",
        F.round("p_treat", 6).alias("p_treat"),
        F.round("mean_t", 6).alias("mean_t"),
        F.round("mean_c", 6).alias("mean_c"),
        F.round("effect", 6).alias("effect"),
    )


SQL_ATE_STRATA = """
WITH per AS (
  SELECT avg(value) AS y,
         (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
            % 2 = 0) AS treat,
         CAST(floor(count(*) / 20.0) AS INT) AS bucket
  FROM events GROUP BY user_id
),
cells AS (
  SELECT CAST(bucket AS VARCHAR) AS stratum,
         count(*) AS n,
         CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
         avg(CASE WHEN treat THEN y END) AS mean_t,
         avg(CASE WHEN NOT treat THEN y END) AS mean_c
  FROM per GROUP BY bucket
),
full_cells AS (
  SELECT stratum, n, n_treat, n_treat * 1.0 / n AS p_treat,
         mean_t, mean_c, mean_t - mean_c AS effect
  FROM cells
),
overall AS (
  SELECT '__all__' AS stratum, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(n_treat) AS BIGINT) AS n_treat,
         sum(n_treat) * 1.0 / sum(n) AS p_treat,
         sum(mean_t * n) / sum(n) AS mean_t,
         sum(mean_c * n) / sum(n) AS mean_c,
         sum(effect * n) / sum(n) AS effect
  FROM full_cells WHERE effect IS NOT NULL
)
SELECT stratum, FALSE AS is_overall, n, n_treat,
       round(p_treat, 6) AS p_treat,
       round(mean_t, 6) AS mean_t, round(mean_c, 6) AS mean_c,
       round(effect, 6) AS effect
FROM full_cells
UNION ALL
SELECT stratum, TRUE, n, n_treat, round(p_treat, 6), round(mean_t, 6),
       round(mean_c, 6), round(effect, 6)
FROM overall
"""


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (operators/segments.py rfm_segments): NTILE(5)
    scores over the per-customer recency/frequency/monetary table —
    global ranks via the bucketed decomposition (no single-partition
    sort), exactly replicating the oracle's NTILE windows."""
    from ..operators.segments import rfm_segments

    orders = load(spark, sf_dir, "orders", spread=True)
    out = rfm_segments(
        orders, key="o_custkey", ts_col="o_orderdate",
        amount_col="o_totalprice", n=5,
    )
    return out.select(
        F.col("key").alias("custkey"), "recency_days", "frequency",
        F.round("monetary", 6).alias("monetary"),
        "r_score", "f_score", "m_score", "segment",
    )


SQL_RFM = """
WITH ao AS (SELECT max(o_orderdate) AS a FROM orders),
per AS (
  SELECT o_custkey AS custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   CAST(ao.a AS DATE)) AS recency_days,
         count(*) AS frequency,
         sum(o_totalprice) AS monetary
  FROM orders CROSS JOIN ao GROUP BY o_custkey, ao.a
),
scored AS (
  SELECT *,
         ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency, custkey) AS f_score,
         ntile(5) OVER (ORDER BY CAST(floor(monetary * 100 + 0.5) AS BIGINT),
                        custkey) AS m_score
  FROM per
)
SELECT custkey, recency_days, frequency, round(monetary, 6) AS monetary,
       r_score, f_score, m_score,
       CASE
         WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
         WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
         WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
         WHEN f_score >= 4 THEN 'loyal'
         WHEN m_score >= 4 THEN 'big_spender'
         WHEN r_score >= 4 THEN 'recent'
         ELSE 'regular'
       END AS segment
FROM scored
"""


def q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (operators/segments.py pareto_curve):
    per-customer revenue, global rank DESC and cumulative share —
    rank + running sum from the bucketed decomposition; the oracle
    runs the plain global window DuckDB can afford."""
    from ..operators.segments import pareto_curve

    orders = load(spark, sf_dir, "orders", spread=True)
    out = pareto_curve(orders, "o_custkey", "o_totalprice")
    return out.select(
        F.col("key").alias("custkey"),
        F.round("amount", 6).alias("amount"),
        "rank",
        F.round("cum_share", 6).alias("cum_share"),
        F.round("frac_keys", 6).alias("frac_keys"),
    )


SQL_PARETO = """
WITH per AS (
  SELECT o_custkey AS custkey, sum(o_totalprice) AS amount
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT *,
         row_number() OVER w AS rank,
         sum(amount) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND
                           CURRENT ROW) AS cum
  FROM per
  WINDOW w AS (ORDER BY CAST(floor(amount * 100 + 0.5) AS BIGINT) DESC,
               custkey)
)
SELECT custkey, round(amount, 6) AS amount, rank,
       round(cum / (SELECT sum(amount) FROM per), 6) AS cum_share,
       round(rank * 1.0 / (SELECT count(*) FROM per), 6) AS frac_keys
FROM ranked
"""


def q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition (operators/ts_features.py
    seasonal_decompose): hourly value series into trend (25-bucket
    symmetric MA), hour-of-series seasonal component and residual —
    every window over the aggregated bucket series (bounded by time
    range, not event count); the oracle replays the identical window
    chain."""
    from ..operators.ts_features import seasonal_decompose

    ev = load(spark, sf_dir, "events")
    out = seasonal_decompose(
        ev, "value", ts_col="ts", grain="hour", period=24
    )
    return out.select(
        (F.unix_micros(F.col("bucket_ts").cast("timestamp"))
         / F.lit(1_000_000)).cast("long").alias("bucket_s"),
        "season_idx",
        F.round("y", 6).alias("y"),
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round("residual", 6).alias("residual"),
    )


SQL_SEASONAL = """
WITH s AS (
  SELECT date_trunc('hour', ts) AS bucket_ts, avg(value) AS y
  FROM events GROUP BY 1
),
t AS (
  SELECT *,
         CAST(CAST(floor(epoch_us(bucket_ts) / 3600000000.0) AS BIGINT) % 24
              AS INT) AS season_idx,
         avg(y) OVER (ORDER BY bucket_ts
                      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
  FROM s
),
r AS (SELECT *, avg(y - trend) OVER (PARTITION BY season_idx) AS rs FROM t),
g AS (SELECT *, avg(rs) OVER () AS grand FROM r)
SELECT CAST(epoch_us(bucket_ts) / 1000000 AS BIGINT) AS bucket_s,
       season_idx,
       round(y, 6) AS y,
       round(trend, 6) AS trend,
       round(rs - grand, 6) AS seasonal,
       round(y - trend - (rs - grand), 6) AS residual
FROM g
"""


def q_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t statistic (operators/causal.py welch_t) on per-user
    outcomes under the md5-deterministic arm assignment — one
    aggregation pass, single-row output."""
    from ..operators.causal import welch_t

    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.avg("value").alias("y"))
    per = per.select(
        "y",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16, 10,
            ).cast("long") % 2 == 0
        ).alias("treat"),
    )
    out = welch_t(per, "treat", "y")
    return out.select(
        "n_t", "n_c",
        F.round("mean_t", 6).alias("mean_t"),
        F.round("mean_c", 6).alias("mean_c"),
        F.round("var_t", 6).alias("var_t"),
        F.round("var_c", 6).alias("var_c"),
        F.round("diff", 6).alias("diff"),
        F.round("std_err", 6).alias("std_err"),
        F.round("t_stat", 6).alias("t_stat"),
        F.round("dof", 6).alias("dof"),
    )


SQL_WELCH_T = """
WITH per AS (
  SELECT avg(value) AS y,
         (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
            % 2 = 0) AS treat
  FROM events GROUP BY user_id
),
a AS (
  SELECT CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(sum(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
         avg(CASE WHEN treat THEN y END) AS mean_t,
         avg(CASE WHEN NOT treat THEN y END) AS mean_c,
         var_samp(CASE WHEN treat THEN y END) AS var_t,
         var_samp(CASE WHEN NOT treat THEN y END) AS var_c
  FROM per
)
SELECT n_t, n_c, round(mean_t, 6) AS mean_t, round(mean_c, 6) AS mean_c,
       round(var_t, 6) AS var_t, round(var_c, 6) AS var_c,
       round(mean_t - mean_c, 6) AS diff,
       round(sqrt(var_t / n_t + var_c / n_c), 6) AS std_err,
       round((mean_t - mean_c) / sqrt(var_t / n_t + var_c / n_c), 6)
         AS t_stat,
       round(pow(var_t / n_t + var_c / n_c, 2)
             / (pow(var_t / n_t, 2) / (n_t - 1)
                + pow(var_c / n_c, 2) / (n_c - 1)), 6) AS dof
FROM a
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
    "future_label": q_future_label,
    "multi_horizon": q_multi_horizon,
    "transcript_parity": q_transcript_parity,
    "group_quantiles": q_group_quantiles,
    "heavy_hitters": q_heavy_hitters,
    "decayed_features": q_decayed_features,
    "recency": q_recency,
    "rolling_distinct": q_rolling_distinct,
    "trend_slope": q_trend_slope,
    "zscore": q_zscore,
    "feature_cross": q_feature_cross,
    "hash_features": q_hash_features,
    "calibration": q_calibration,
    "label_agreement": q_label_agreement,
    "transitions": q_transitions,
    "turn_novelty": q_turn_novelty,
    "embedding_pool": q_embedding_pool,
    "scale_features": q_scale_features,
    "impute": q_impute,
    "winsorize": q_winsorize,
    "mi_scores": q_mi_scores,
    "quantile_norm": q_quantile_norm,
    "resample": q_resample,
    "cv_folds": q_cv_folds,
    "purged_folds": q_purged_folds,
    "negative_samples": q_negative_samples,
    "quality_checks": q_quality_checks,
    "isotonic": q_isotonic,
    "dist_distance": q_dist_distance,
    "time_rollup": q_time_rollup,
    "distinct_rollup": q_distinct_rollup,
    "time_to_event": q_time_to_event,
    "drift_timeline": q_drift_timeline,
    "group_models": q_group_models,
    "funnel": q_funnel,
    "cohort": q_cohort,
    "cusum": q_cusum,
    "seq_ngrams": q_seq_ngrams,
    "interval_join": q_interval_join,
    "scd2": q_scd2,
    "snapshot": q_snapshot,
    "kaplan_meier": q_kaplan_meier,
    "cuped": q_cuped,
    "ate_strata": q_ate_strata,
    "rfm": q_rfm,
    "pareto": q_pareto,
    "seasonal": q_seasonal,
    "welch_t": q_welch_t,
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
    "future_label": SQL_FUTURE_LABEL,
    "multi_horizon": SQL_MULTI_HORIZON,
    "transcript_parity": SQL_TRANSCRIPT_PARITY,
    "group_quantiles": SQL_GROUP_QUANTILES,
    "heavy_hitters": SQL_HEAVY_HITTERS,
    "decayed_features": SQL_DECAYED,
    "recency": SQL_RECENCY,
    "rolling_distinct": SQL_ROLLING_DISTINCT,
    "trend_slope": SQL_TREND,
    "zscore": SQL_ZSCORE,
    "feature_cross": SQL_FEATURE_CROSS,
    "hash_features": SQL_HASH_FEATURES,
    "calibration": SQL_CALIBRATION,
    "label_agreement": SQL_LABEL_AGREEMENT,
    "transitions": SQL_TRANSITIONS,
    "turn_novelty": SQL_TURN_NOVELTY,
    "embedding_pool": SQL_EMBEDDING_POOL,
    "scale_features": SQL_SCALE_FEATURES,
    "impute": SQL_IMPUTE,
    "winsorize": SQL_WINSORIZE,
    "mi_scores": SQL_MI_SCORES,
    "quantile_norm": SQL_QUANTILE_NORM,
    "resample": SQL_RESAMPLE,
    "cv_folds": SQL_CV_FOLDS,
    "purged_folds": SQL_PURGED_FOLDS,
    "negative_samples": SQL_NEGATIVE_SAMPLES,
    "quality_checks": SQL_QUALITY_CHECKS,
    "isotonic": SQL_ISOTONIC,
    "dist_distance": SQL_DIST_DISTANCE,
    "time_rollup": SQL_TIME_ROLLUP,
    "distinct_rollup": SQL_DISTINCT_ROLLUP,
    "time_to_event": SQL_TIME_TO_EVENT,
    "drift_timeline": SQL_DRIFT_TIMELINE,
    "group_models": SQL_GROUP_MODELS,
    "funnel": SQL_FUNNEL,
    "cohort": SQL_COHORT,
    "cusum": SQL_CUSUM,
    "seq_ngrams": SQL_SEQ_NGRAMS,
    "interval_join": SQL_INTERVAL_JOIN,
    "scd2": SQL_SCD2,
    "snapshot": SQL_SNAPSHOT,
    "kaplan_meier": SQL_KAPLAN_MEIER,
    "cuped": SQL_CUPED,
    "ate_strata": SQL_ATE_STRATA,
    "rfm": SQL_RFM,
    "pareto": SQL_PARETO,
    "seasonal": SQL_SEASONAL,
    "welch_t": SQL_WELCH_T,
}
