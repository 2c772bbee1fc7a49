"""didtool_spark feature-bank tour — the round-4 extensions.

Walks the classic tabular feature pipeline the reference delegated to
sklearn, plus the sequence/embedding features a transcript store needs:

1. cleaning:  winsorize -> impute -> scale (fit/apply split — the stats
   frames are small, checkpointable, and literal-inlined at apply)
2. encoding:  hashed crossed features + hashing-trick sparse vectors
   (stateless — nothing to fit, nothing to broadcast)
3. distribution: quantile transform to normal (grid + Acklam probit,
   no global sort)
4. ranking:   mutual-information scores per feature
5. sequence:  Markov transitions + turn-to-turn novelty per entity
6. vectors:   per-entity embedding pooling
7. evaluation: reliability table / ECE / Brier + Cohen's kappa

Everything is a lazy DataFrame plan; the only driver-side values are
O(columns) statistics frames.

Run:  python examples/feature_bank.py [testdata_dir]
      (default: /root/testdata/sf0.001)
"""

import os
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import didtool_spark as dt  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[4]")
    .appName("didtool-spark-feature-bank")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

ev = spark.read.parquet(f"{sf_dir}/events.parquet")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

# ------------------------------------------- 1. clean numeric columns
clipped = dt.winsorize(ev, ["value"], lower=0.01, upper=0.99)
imp_stats = dt.fit_imputer(clipped, num_cols=["value_w"], cat_cols=["event_type"])
print("imputer stats:", imp_stats.collect())
clean = dt.apply_imputer(clipped, imp_stats)

scale_stats = dt.fit_scaler(clean, ["value_w"], method="robust")
print("scaler stats:", scale_stats.collect())
scaled = dt.apply_scaler(clean, scale_stats)

# ------------------------------------------- 2. stateless encodings
crossed = dt.hashed_cross(scaled, ["event_type", "user_id"], n_buckets=1024)
vec = dt.hash_vectorize(
    crossed, cat_cols=["event_type"], num_cols=["value_w_scaled"],
    n_features=2**18,
)
print(vec.select("event_id", "event_type_x_user_id_b", "features").limit(3).collect())

# ------------------------------------------- 3. distribution transform
qt = dt.quantile_transform(ev, ["value"], n_quantiles=100, output="normal")
print("rank-gauss sample:", qt.select("event_id", "value", "value_q").limit(3).collect())

# ------------------------------------------- 4. feature ranking by MI
binned = ev.select(
    "event_type",
    F.floor(F.col("value") / 50.0).cast("long").alias("value_bin"),
    (F.col("event_id") % 3).alias("y"),
)
print("MI ranking:", dt.mi_scores(binned, ["event_type", "value_bin"]).collect())

# ------------------------------------------- 5. sequence features
trans = dt.transition_counts(ev, "event_type", keys="user_id",
                             order=("ts", "event_id"))
print("top transitions:",
      trans.orderBy(F.desc("n")).limit(5).collect())
nov = dt.with_turn_novelty(ev, "props", keys="user_id", order=("ts", "event_id"))
print("mean turn-repeat (1.0 = stalled):",
      nov.agg(F.avg("props_jaccard_prev")).collect()[0][0])

# ------------------------------------------- 6. embedding pooling
pooled = dt.pool_embeddings(emb, "embedding", keys="label",
                            aggs=("mean",), l2_normalize=True)
print("pooled per-label vectors:", pooled.select("label", "n_vecs").collect())

# ------------------------------------------- 7. grids, CV, negatives, QA
grid = dt.resample_grid(ev, "value", step_s=6 * 3600, keys="user_id",
                        agg="last", ffill=True)
print("resampled grid cells:", grid.count())

folds = dt.rolling_origin_folds(ev, n_folds=5, ts_col="ts")
print("rows per time segment:",
      sorted((r["segment"], r["count"]) for r in
             folds.groupBy("segment").count().collect()))

# positives = each user's purchase/signup interactions; the other
# event types are the candidate negative space
pos = (
    ev.where(F.col("event_type").isin("purchase", "signup"))
    .select("user_id", F.col("event_type").alias("item"))
    .distinct()
)
items = ev.select(F.col("event_type").alias("item")).distinct()
negs = dt.negative_samples(pos, items, k=2, item_col="item")
print("negative pairs:", negs.count(),
      negs.limit(3).collect())

report = dt.validate(ev, [
    dt.not_null("value"),
    dt.in_range("value", 0, 1000),
    dt.unique("event_id"),
    dt.min_rows(100),
])
print("data-quality gate:", report.collect())

# ------------------------------------------- 8. evaluation
scored = ev.withColumn(
    "score", 1.0 / (1.0 + F.exp(-(F.col("value") - 50.0) / 25.0))
).withColumn("label", F.col("event_type").isin("purchase", "signup").cast("int"))
print("reliability:",
      dt.reliability_table(scored, "score", "label").orderBy("bin").collect())
print("calibration:", dt.calibration_metrics(scored, "score", "label").collect())
lab = scored.withColumn("a", (F.col("value") > 5.0).cast("int")).withColumn(
    "b", F.col("label")
)
print("labeler agreement:", dt.cohen_kappa(lab, "a", "b").collect())


# ------------------------------------------- 9. monitoring & rollups
# hour/day/week aggregates from ONE base scan (coarser grains merge
# the finer grain's partials; AQE reuses the shared shuffles)
roll = dt.time_rollup(
    ev, [("value", "sum"), ("value", "avg")],
    grains=("hour", "day", "week"), keys="user_id", ts_col="ts",
)
print("rollup rows per grain:",
      sorted((r["grain"], r["count"]) for r in
             roll.groupBy("grain").count().collect()))
# distinct users per day/week via mergeable HLL sketches
dr = dt.distinct_rollup(ev, "user_id", grains=("day", "week"),
                        keys=(), ts_col="ts")
print("distinct-user weeks:",
      dr.where(F.col("grain") == "week").orderBy("bucket_ts").limit(3).collect())
# weekly drift of the serving stream vs a reference split
ref = ev.where(F.col("event_id") % 2 == 0)
live = ev.where(F.col("event_id") % 2 == 1)
print("weekly drift:",
      dt.drift_timeline(ref, live, "value", period="week")
      .orderBy("period_ts").limit(3).collect())

# ------------------------------------------- 10. per-segment models
# one logistic model per event_type, applied as a codegen dot product
seg = ev.withColumn("x1", F.col("value") / 500.0).withColumn(
    "x2", F.pmod(F.col("user_id"), 10) / 10.0
).withColumn("y", (F.col("value") > 50).cast("int"))
models = dt.fit_logistic_per_group(
    seg, ["x1", "x2"], "y", group_cols="event_type"
)
print("segment models:", models.orderBy("event_type").limit(2).collect())
scored_seg = dt.apply_group_models(
    seg, models, ["x1", "x2"], group_cols="event_type"
)
print("segment-scored sample:",
      scored_seg.select("event_type", "score").limit(3).collect())

# survival labels: seconds to the user's next error, censored at 24h
tte = dt.with_time_to_event(
    ev, F.col("event_type") == "error", 86400, keys="user_id", ts_col="ts"
)
print("time-to-event observed fraction:",
      tte.agg(F.avg(F.col("tte_observed").cast("double"))).collect())


# ------------------------------------------- 11. behavioral analytics
fun = dt.funnel(
    ev,
    [("view", F.col("event_type") == "view"),
     ("click", F.col("event_type") == "click"),
     ("purchase", F.col("event_type") == "purchase")],
    keys="user_id", order=("ts", "event_id"), horizon_s=7 * 86400,
)
print("funnel depth distribution:",
      sorted((r["depth"], r["count"]) for r in
             fun.groupBy("depth").count().collect()))
print("weekly retention:",
      dt.cohort_retention(ev, key="user_id", grain="week")
      .orderBy("cohort_ts", "age").limit(4).collect())
cu = dt.with_cusum(ev, "value", target=50.0, slack=5.0, threshold=200.0,
                   keys="user_id", order=("ts", "event_id"))
print("cusum alarms:", cu.where(F.col("value_cusum_alarm")).count())
print("top event 3-grams:",
      dt.seq_ngrams(ev, "event_type", n=3, keys="user_id",
                    order=("ts", "event_id"), min_count=2)
      .orderBy(F.desc("n")).limit(3).collect())

# ------------------------------------------- 12. dimensions & experiments
# SCD2: collapse each user's event_type change stream into validity
# intervals a point-in-time join can consume
dim = dt.scd2_compress(ev, "event_type", keys="user_id",
                       order=("ts", "event_id"))
print("scd2 runs per user (mean):",
      dim.groupBy("user_id").count().agg(F.avg("count")).collect())
# CDC compaction: the latest record per (user, event_type)
snap = dt.snapshot_latest(ev, keys=("user_id", "event_type"),
                          order=("ts", "event_id"))
print("snapshot rows:", snap.count())

# Kaplan-Meier: time from first event to first purchase, censored
per_u = ev.groupBy("user_id").agg(
    F.min("ts").alias("t0"),
    F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    F.max("ts").alias("tl"),
)
dur = per_u.select(
    ((F.unix_micros(F.coalesce("tp", "tl").cast("timestamp"))
      - F.unix_micros(F.col("t0").cast("timestamp"))) / 3.6e9)
    .cast("long").alias("hours"),
    F.col("tp").isNotNull().alias("obs"),
)
km = dt.kaplan_meier(dur, "hours", "obs")
print("KM tail survival:",
      km.orderBy(F.desc("duration")).limit(1).collect())

# CUPED + stratified ATE on per-user outcomes
per_y = ev.groupBy("user_id").agg(
    F.sum(F.when(F.col("event_type") == "view", F.col("value"))).alias("x"),
    F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))).alias("y"),
).fillna(0.0)
adj = dt.cuped_adjust(per_y, "y", "x")
print("CUPED theta:", adj.select("theta").first())
strat = per_y.withColumn("treat", F.pmod("user_id", F.lit(2)) == 0) \
             .withColumn("s", F.pmod("user_id", F.lit(3)))
print("stratified ATE:",
      dt.ate_strata(strat, "treat", "y", "s")
      .where(F.col("is_overall")).collect())

# ------------------------------------------- 13. value & graph analytics
orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
rfm = dt.rfm_segments(orders, key="o_custkey", ts_col="o_orderdate",
                      amount_col="o_totalprice")
print("RFM segments:",
      sorted((r["segment"], r["count"]) for r in
             rfm.groupBy("segment").count().collect()))
par = dt.pareto_curve(orders, "o_custkey", "o_totalprice")
half = par.where(F.col("frac_keys") <= 0.2).orderBy(F.desc("rank")).limit(1)
print("top-20% customers hold:", half.select("cum_share").collect())

# weighted sampling: 2 orders per customer, value-proportional
ws = dt.weighted_sample(orders, "o_custkey", 2, "o_orderkey",
                        "o_totalprice")
print("weighted sample rows:", ws.count())

# CMS over document tokens: bounded state at any cardinality
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
toks = docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
sk = dt.cms_build(toks, "t", width=256, depth=4)
print("sketch cells:", sk.count())

# blocked record linkage on customer names
cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
fp = dt.fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=2,
                    prefix_len=16)
print("fuzzy name pairs:", fp.count())

# PageRank over the parts-co-ordered graph
li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
edges = a.join(b, "ok").where(F.col("src") != F.col("dst")) \
         .select("src", "dst").distinct()
pr = dt.pagerank(edges, iterations=4)
print("top parts by PageRank:",
      pr.orderBy(F.desc("rank")).limit(3).collect())

# attribution: which touches get credit for each purchase
att = dt.attribute_touches(
    ev, touch=F.col("event_type").isin("view", "click"),
    conversion=F.col("event_type") == "purchase", model="position_based",
)
print("credited touches:",
      att.where(F.col("credit") > 0).count())

# embeddings: JL projection to 8 dims + exact PCA explained variance
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
model = dt.pca_fit(emb, "embedding", k=4)
print("PCA explained-variance ratio:",
      [round(r, 4) for r in model.explained_variance_ratio])

spark.stop()
print("feature-bank tour complete")
