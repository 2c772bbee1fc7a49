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
    # -- tier 1 (round 6): every query whose execution machinery this
    # optimization round restructured — the driver gate must re-prove
    # them, not just the local --bitexact replay.  pagerank (bounded
    # numpy driver path + int ids + dedupe-inside), negative_samples
    # (anti-join build side), fuzzy_pairs/entity_resolution (Arrow
    # levenshtein kernel, shared memo), dedup_clusters/split_by_cluster
    # (numpy union-find consumers), winsorize (histogram exact
    # percentiles), hash_features (long-form vectorize),
    # corpus_curation (checkpoint barrier), semantic_dedup (blocked
    # kernel + pinned repartition), simhash (filter-before-dedup),
    # minhash (spread docs), rfm/pareto (cache-release fix),
    # quantile_norm (spread + grid fold).
    "pagerank", "negative_samples", "fuzzy_pairs", "entity_resolution",
    "dedup_clusters", "split_by_cluster", "winsorize", "hash_features",
    "corpus_curation", "semantic_dedup", "simhash_dedup",
    "minhash_dedup", "rfm", "pareto", "quantile_norm",
    # -- tier 2 (VERDICT r5 next-round #2): the stalest evidence — the
    # cohort whose only driver check was round 3, now two rounds of
    # code drift behind (scan-spread touches every plan; the packed
    # shuffle row touches session_features).  All green in every
    # full-registry bitexact replay since.
    "sessionize", "user_rollup", "lag_lead", "rolling", "rolling_time",
    "backfill", "asof_join", "asof_join_bucketed", "asof_nearest",
    "session_features", "training_set", "step_bin", "quantile_bin",
    "dt_bin", "lgb_bin", "chi_bin", "woe_encode", "iv_discrete",
    "iv_continuous", "psi_discrete", "psi_continuous", "iv_all",
    "psi_all", "selector_stats", "list_encode", "category_encode",
    "onehot_encode", "label_encode", "split_groups", "split_stacking",
    "auc_ks", "auc_ks_binned", "scorecard", "target_encode",
    "text_features",
    # (the rest of the r3 cohort — lang_id, exact_dedup, fingerprints,
    # ngram_jaccard, the embedding family — did not fit the 50-window;
    # they and every other rotated-out query stay guarded by the
    # full-registry scripts/check_oracle.py --bitexact sweeps and
    # tests/test_registry.py.)
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
