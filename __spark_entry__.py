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

# The driver's correctness gate hashes the FIRST ~50 registry entries, so
# ordering is coverage policy.  Priority tiers (within a tier, stable
# registry order):
#   1. queries never driver-hash-checked (new this round, or outside the
#      round-3 window) — positions 51-74 of the round-3 registry;
#   2. queries driver-green exactly once (first green in round 3);
#   3. queries driver-green two+ rounds running — rotated to the back;
#      `scripts/check_oracle.py` (full-registry local replay) remains the
#      guard that these stay value-correct.
# tests/test_registry.py pins the resulting first-50 window.
GATE_PRIORITY: list[str] = [
    # -- tier 1: never inside a driver gate window (r3 positions 51-74)
    "pack_sequences", "corpus_curation", "decontaminate", "quality_gopher",
    "domain_mix", "lm_perplexity", "substring_dedup", "importance_resample",
    "c4_clean", "paragraph_dedup", "tfidf_keywords", "quality_classifier",
    "fingerprint_overlap", "collocations", "semantic_dedup",
    "prototype_prune", "bpe_tokenize", "pack_conversations", "loop_stats",
    "render_conversations", "truncate_convs", "role_stats", "tool_payloads",
    "outcome_labels",
    # -- tier 1 (round 4): new this round
    "url_dedup", "asof_nearest", "target_encode",
    "future_label", "multi_horizon", "transcript_parity",
    "group_quantiles", "heavy_hitters",
    "bm25_topk", "length_buckets", "text_normalize", "ngram_diversity",
    "profile_table", "group_sample", "skew_stats",
    "decayed_features", "recency", "rolling_distinct", "trend_slope",
    "zscore",
    # -- tier 1 (round 4, sessions 5-6): the five float-hairiest of the
    # never-checked feature-bank queries (probit folds, log-based MI,
    # reliability/PAV calibration, multi-distance drift) — queries first
    # driver-checked only in round 5 would have no recovery round if an
    # oracle edge diverges, so the riskiest go through the gate now
    "mi_scores", "quantile_norm", "calibration", "isotonic",
    "dist_distance",
    # -- tier 2: media_features stays up front — its gate input gained
    # the real JPEG/PNG decode this round, so its r3 green does not
    # cover it
    "media_features",
    # (rotated out of the window, lowest regression risk first: the
    # remaining round-3-green entries (user_rollup / training_set /
    # dt_bin / lgb_bin / chi_bin moved out this session — each has
    # golden units and a stable oracle), chunk_docs / stratified_sample
    # / pii_scrub (pure expressions), scorecard (driver arithmetic with
    # goldens), iv_all / psi_all / selector_stats (aggregation fits
    # with golden units), dedup_clusters / split_by_cluster /
    # embedding_topk_ivf (literal-replay oracles, heavy unit suites,
    # the gate's three heaviest entries); tier 3 (session_features,
    # minhash_dedup — green r2 AND r3) rotates fully behind.  The
    # still-never-checked remainder (feature_cross, hash_features,
    # label_agreement, transitions, turn_novelty, embedding_pool,
    # scale_features, impute, winsorize, resample, cv_folds,
    # purged_folds, negative_samples, quality_checks, the session-7
    # additions time_rollup, distinct_rollup, time_to_event,
    # drift_timeline, group_models, funnel, cohort, cusum, seq_ngrams,
    # interval_join, plus the session-8 additions scd2, snapshot,
    # kaplan_meier, cuped, ate_strata, rfm, pareto, cms_topk,
    # readability, random_projection, fuzzy_pairs, pagerank,
    # weighted_sample, attribution, seasonal, welch_t,
    # entity_resolution) is round 5's window.  All queries outside the window stay guarded by
    # scripts/check_oracle.py full-registry local replays.)
]


def _gate_order() -> list[str]:
    """Canonical registry order: GATE_PRIORITY first, then the remaining
    queries in their stable QUERIES-dict order (shared by oracle_sql so
    both dicts always iterate identically)."""
    merged = list(demo_queries.QUERIES) + list(operator_queries.OP_QUERIES) \
        + list(pipeline_queries.PIPELINE_QUERIES)
    prio = {name: i for i, name in enumerate(GATE_PRIORITY)}
    return sorted(
        merged, key=lambda n: (prio.get(n, len(GATE_PRIORITY)), merged.index(n))
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return demo_queries.q_session_features(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged = {
        **demo_queries.QUERIES,
        **operator_queries.OP_QUERIES,
        **pipeline_queries.PIPELINE_QUERIES,
    }
    return {n: merged[n] for n in _gate_order()}


def oracle_sql() -> dict[str, str]:
    merged = {
        **demo_queries.ORACLES,
        **operator_queries.OP_ORACLES,
        **pipeline_queries.PIPELINE_ORACLES,
    }
    return {n: merged[n] for n in _gate_order()}
