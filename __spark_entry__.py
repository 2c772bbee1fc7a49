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
    # -- tier 1 (round 5): the 41 registry queries never inside a
    # driver gate window (sessions 5-8 additions; each was green in
    # every full-registry local replay and in the r5 --bitexact sweep)
    "feature_cross", "hash_features", "label_agreement", "transitions",
    "turn_novelty", "embedding_pool", "scale_features", "impute",
    "winsorize", "resample", "cv_folds", "purged_folds",
    "negative_samples", "quality_checks", "time_rollup",
    "distinct_rollup", "time_to_event", "drift_timeline", "group_models",
    "funnel", "cohort", "cusum", "seq_ngrams", "interval_join", "scd2",
    "snapshot", "kaplan_meier", "cuped", "ate_strata", "rfm", "pareto",
    "cms_topk", "readability", "random_projection", "fuzzy_pairs",
    "pagerank", "weighted_sample", "attribution", "seasonal", "welch_t",
    "entity_resolution",
    # -- tier 1b: the two r4 gate reds, re-checked after the
    # negative-zero oracle fix (round(...)+0 — VERDICT r4 #1)
    "trend_slope", "quantile_norm",
    # -- tier 2 re-checks: media_features (decoder surface changed in
    # r4/r5) plus the float-hairiest r4-greens that share the rounded-
    # output shape the neg-zero class lives in — kept in-window so the
    # class fix is confirmed not to disturb formerly-green hashes
    "media_features", "mi_scores", "calibration", "isotonic",
    "dist_distance", "zscore", "decayed_features",
    # (everything else has been driver-hash-green in r3 or r4 and
    # remains guarded by scripts/check_oracle.py --bitexact
    # full-registry replays and tests/test_registry.py.)
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
