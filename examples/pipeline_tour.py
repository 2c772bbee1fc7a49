"""didtool_spark pipeline tour — the parts the reference lacks.

A compact walkthrough of the engine's two extension tiers:

1. the point-in-time temporal core over multi-turn transcripts
   (sessionize -> lag/lead -> rolling -> forward-fill -> as-of join),
   the north-rule flagship (plans/materialize.py), and
2. the training-data curation operators over the ``documents`` table
   (dedup, quality rules, PII scrub, LM perplexity, packing).

Everything stays a lazy DataFrame plan; the only driver-side results
are small stats tables and ``limit()`` samples.

Run:  python examples/pipeline_tour.py [testdata_dir]
      (default: /root/testdata/sf0.001)
"""

import os
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import didtool_spark as dt  # noqa: E402
from didtool_spark.data.transcripts import generate_transcripts  # noqa: E402
from didtool_spark.plans.materialize import materialize_features  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[4]")
    .appName("didtool-spark-pipeline-tour")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# ------------------------------------------- 1. temporal core
turns = generate_transcripts(spark, n_convs=200, avg_turns=12)
print("transcript turns:", turns.count())

# the flagship: sessionize + lags + rolling + ffill + text features in
# ONE plan sharing a single (conv_id, ts) partitioning
feats = materialize_features(turns)
print("feature columns:", feats.columns)
print(feats.select("conv_id", "turn_idx", "session_id", "text_len_lag1",
                   "text_len_sum_last5").limit(3).collect())
# every feature at a turn reads only data at or before that turn — the
# same plan at strategy='bucketed' survives an arbitrarily hot key

# a point-in-time as-of join: each turn picks up the latest
# side-feature at or before its timestamp, never after (zero leakage)
side = turns.where(F.col("turn_idx") % 5 == 0).select(
    "conv_id", "ts", (F.col("turn_idx") * 10).alias("side_metric"))
joined = dt.asof_join(turns, side, keys="conv_id", ts_col="ts",
                      value_cols=["side_metric"])
print("asof sample:", joined.select("conv_id", "turn_idx",
                                    "side_metric").limit(3).collect())

# transcript QA: agent-loop detection, context-window truncation,
# conversation rendering
print("loopy convs:", dt.loop_stats(turns).where("is_looping").count())
kept = dt.truncate_conversations(
    turns.withColumn("n_tokens", F.size(F.split("text", r"\s+"))),
    budget=256)
print("turns kept under a 256-token context budget:", kept.count())
print(dt.render_conversations(turns).select("text")
      .limit(1).collect()[0]["text"][:120], "...")

# ------------------------------------- 2. corpus curation
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

dupes = dt.exact_dupes(docs)
near = dt.minhash_near_dupes(docs, n_hashes=32, bands=16)
print("exact dup rows:", dupes.where("is_dup = 1").count(),
      " minhash near-dup pairs:", near.count())

quality = dt.gopher_quality(docs)
print("gopher keep rate:",
      quality.agg(F.avg(F.col("keep").cast("double"))).collect()[0][0])

scrubbed = dt.scrub_pii(docs.withColumn(
    "text", F.concat("text", F.lit(" mail me at a@b.org"))), "text")
print("pii redactions:", scrubbed.agg(F.sum("n_email")).collect()[0][0])

ppl = dt.lm_perplexity(docs)  # bigram LM fit on the corpus itself
print("perplexity quantiles:",
      ppl.approxQuantile("perplexity", [0.1, 0.5, 0.9], 0.01))

packed = dt.pack_sequences(
    docs.withColumn("n_tok", F.size(F.split("text", r"\s+"))),
    token_col="n_tok", budget=512)
print("packed sequences:",
      packed.select("shard", "pack_no").distinct().count(), "packs")

# --- label side + distribution features + parity (round 4) -------------
ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
    "is_error", (F.col("event_type") == "error").cast("int"))
labeled = dt.with_future_label(
    ev, [("is_error", "max", 600)], keys="user_id", ts_col="ts", fill=0)
print("error-within-10m positive rate:",
      labeled.agg(F.avg("is_error_max_next600s")).collect()[0][0])

quants = dt.group_quantiles(ev, "value", [0.5, 0.9], keys="user_id")
print("per-user p90 spread:",
      quants.agg(F.min("value_p90"), F.max("value_p90")).collect()[0])

hh = dt.heavy_hitters(ev, "event_type", keys="user_id", k=1)
print("most common top event type:",
      hh.groupBy("item").count().orderBy(F.desc("count")).first())

# --- time-series feature block (one shuffle for the whole family) ----
tsf = dt.with_decayed(
    ev, [("value", "sum"), ("value", "count")], half_life_s=3600,
    keys="user_id", order=("ts", "event_id"), ts_col="ts")
tsf = dt.with_recency(
    tsf, {"error": F.col("event_type") == "error"},
    keys="user_id", order=("ts", "event_id"), ts_col="ts")
tsf = dt.with_rolling_distinct(
    tsf, "event_type", k=10, keys="user_id", order=("ts", "event_id"))
tsf = dt.with_trend(
    tsf, "value", 8, keys="user_id", order=("ts", "event_id"), ts_col="ts")
tsf = dt.with_zscore(tsf, "value", 10, keys="user_id", order=("ts", "event_id"))
print(tsf.select(
    "event_id", "value_decsum_3600s", "secs_since_error",
    "event_type_nunique_last10", "value_slope_last8", "value_z_last10",
).limit(3).collect())

par = dt.transcript_parity(
    ev.select("user_id", "event_id", F.col("event_type").alias("text")),
    ev.where("event_id % 97 != 0")
      .select("user_id", "event_id", F.col("event_type").alias("text")),
    keys=("user_id", "event_id"))
print("parity:", {r["status"]: r["n_turns"] for r in par.collect()})

spark.stop()
