"""didtool_spark — a PySpark-native feature-engineering engine.

Reimplements the capabilities of the reference feature-engineering
toolkit (dustless/didtool) Spark-first: fit = distributed aggregation
-> small broadcastable state; transform = generated column expressions;
plus the point-in-time temporal core (as-of join, lag/lead, rolling,
sessionization, backfill) and the training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal) the reference
lacks.

The flat namespace mirrors the reference's ``didtool/__init__.py`` so a
user can port imports one-for-one (APIs take (df, col, ...) instead of
pandas arrays — inherent to the engine being distributed).
"""
__version__ = "0.2.0"

from .session import get_spark  # noqa: F401

# binning (reference cut.py)
from .operators.binning import (  # noqa: F401
    Binner, chi_edges, chi_square_cut, cut, cut_with_bins,
    cut_with_edges, dt_cut, dt_edges, lgb_cut, lgb_edges, quantile_cut,
    quantile_edges, step_cut, step_edges,
)

# splits (reference split.py)
from .operators.split import (  # noqa: F401
    split_data, split_data_random, split_data_stacking,
)

# metrics / stats (reference metric.py, stats.py)
from .operators.metrics import (  # noqa: F401
    auc, auc_ks_values, distribution, distributions, iv, iv_all, ks,
    ks_curve, layer_stability_tables, pr_curve, psi, psi_all, roc_curve,
)

# transformers / encoders (reference transformer.py, encoder.py)
from .operators.woe import (  # noqa: F401
    LabelEncoder, SingleWOETransformer, WOEEncoder, WOETransformer,
)
from .operators.category import (  # noqa: F401
    CategoryTransformer, ListTransformer, OneHotTransformer,
)

WrappedLabelEncoder = LabelEncoder  # reference encoder.py:84 name

# selection / scorecard / models (reference selector.py, scorecard.py,
# model.py)
from .operators.selector import Selector  # noqa: F401
from .operators.scorecard import ScoreCardTransformer  # noqa: F401
from .operators.model import (  # noqa: F401
    GBMModelSingle, GBMModelStacking, load_model_bundle,
)
from .operators.mapper import FeatureMapper  # noqa: F401
from .operators.scoring import stacking_evaluate, with_score  # noqa: F401

# temporal core (north rule; no reference counterpart)
from .operators.temporal import (  # noqa: F401
    FeatureTable, asof_join, build_training_set, forward_fill,
    interval_join, sessionize, with_lags, with_rolling,
)

# training-data pipeline operators
from .operators.dedup import (  # noqa: F401
    NearDupIndex, connected_components, dedup_clusters,
    duplicated_substring_stats, exact_dupes, minhash_bucket_stats,
    minhash_near_dupes, near_dup_index, ngram_jaccard_pairs,
    paragraph_dedup, remove_duplicated_substrings, simhash_near_dupes,
    split_by_cluster,
)
from .operators.dsir import (  # noqa: F401
    dsir_log_ratios, dsir_scores, importance_resample,
)
from .operators.classifier import (  # noqa: F401
    QualityClassifier, doc_bucket_counts, fit_quality_classifier,
    score_quality,
)
from .operators.similarity import (  # noqa: F401
    cosine_topk, embedding_near_dupes, ivf_fit_centroids, ivf_topk,
    lsh_topk, prototype_prune, semantic_dedup,
)
from .operators.bpe import (  # noqa: F401
    bpe_tokenize, fit_bpe,
)
from .operators.transcript import (  # noqa: F401
    attach_outcome, loop_stats, render_conversations, role_stats,
    truncate_conversations,
)
from .operators.labels import (  # noqa: F401
    with_future_label, with_time_to_event,
)
from .operators.parity import transcript_parity  # noqa: F401
from .operators.stats_features import (  # noqa: F401
    group_quantiles, heavy_hitters,
)
from .operators.ts_features import (  # noqa: F401
    with_cusum, with_decayed, with_recency, with_rolling_distinct,
    with_trend, with_zscore,
)
from .operators.feature_hash import hash_vectorize, hashed_cross  # noqa: F401
from .operators.calibration import (  # noqa: F401
    apply_isotonic, calibration_metrics, cohen_kappa,
    distribution_distance, drift_timeline, fit_isotonic, isotonic_fit_points,
    reliability_table,
)
from .operators.seq_features import (  # noqa: F401
    seq_ngrams, transition_counts, with_turn_novelty,
)
from .operators.pooling import pool_embeddings  # noqa: F401
from .operators.scalers import (  # noqa: F401
    apply_imputer, apply_scaler, fit_imputer, fit_scaler, winsorize,
)
from .operators.mi import mi_scores, quantile_transform  # noqa: F401
from .operators.resample import (  # noqa: F401
    distinct_rollup, resample_grid, time_rollup,
)
from .operators.cv import purged_kfold, rolling_origin_folds  # noqa: F401
from .operators.negatives import negative_samples  # noqa: F401
from .operators.cohort import cohort_retention  # noqa: F401
from .operators.funnel import funnel  # noqa: F401
from .operators.group_models import (  # noqa: F401
    apply_group_models, fit_logistic_arrays, fit_logistic_per_group,
)
from .operators.quality_checks import (  # noqa: F401
    accepted_values, in_range, min_rows, not_null, unique, validate,
)
from .functions.exprs import with_json_fields  # noqa: F401
from .operators.text import (  # noqa: F401
    collocations, fingerprint_exprs, fingerprint_overlap, ngram_diversity,
    normalize_text, normalize_text_expr, tfidf_keywords,
    winnow_fingerprints, with_lang_id, with_text_features,
)

# ad-hoc BM25 keyword retrieval (zero-shuffle single-query scoring)
from .operators.retrieval import bm25_topk  # noqa: F401

# table profiling, deterministic per-group sampling (uniform +
# Efraimidis-Spirakis weighted), key-skew report
from .operators.profile import (  # noqa: F401
    group_sample, profile_table, skew_stats, weighted_sample,
)

# SCD type-2 dimension build + CDC snapshot compaction
from .operators.scd import scd2_compress, snapshot_latest  # noqa: F401

# Kaplan-Meier survival curves over censored durations
from .operators.survival import kaplan_meier  # noqa: F401

# experiment analytics: CUPED adjustment, post-stratified ATE, Welch t
from .operators.causal import ate_strata, cuped_adjust, welch_t  # noqa: F401

# additive seasonal decomposition over bucketed series
from .operators.ts_features import seasonal_decompose  # noqa: F401

# entity-value segmentation: RFM NTILE scores, Pareto concentration
from .operators.segments import pareto_curve, rfm_segments  # noqa: F401

# count-min sketch: mergeable approximate frequency counting
from .operators.sketches import cms_build, cms_merge, cms_query  # noqa: F401

# exact PCA + Johnson-Lindenstrauss random projection over embeddings
from .operators.pca import (  # noqa: F401
    pca_fit, pca_project, random_project,
)

# blocked fuzzy record linkage (levenshtein within blocking keys)
from .operators.linkage import fuzzy_pairs, normalize_name  # noqa: F401

# PageRank over edge tables (fixed-round message-passing joins)
from .operators.graph import pagerank  # noqa: F401

# multi-touch conversion attribution over per-key event streams
from .operators.attribution import attribute_touches  # noqa: F401

# Flesch readability statistics (pure codegen expressions)
from .operators.text import with_readability  # noqa: F401

# training-data curation (PII scrub, chunking, sampling, packing)
from .operators.curate import (  # noqa: F401
    chunk_documents, length_bucket_stats, pack_sequences, scrub_pii,
    stratified_sample,
)

# URL canonicalization, registrable-domain blocklisting, URL-level dedup
from .operators.url import (  # noqa: F401
    canonical_url_expr, canonicalize_urls, domain_filter,
    registered_domain_expr, url_dedup,
)

# leakage-controlled mean/target encoding (oof / loo / smoothed-global)
from .operators.target_encode import (  # noqa: F401
    apply_target_encoding, fit_target_encoding, target_encode,
)

# benchmark decontamination, Gopher quality rules, domain mixing
from .operators.decontam import (  # noqa: F401
    c4_rules, decontaminate, domain_mix, gopher_quality,
)

# n-gram LM perplexity quality scoring (CCNet-style filter)
from .operators.lm import NgramLM, lm_perplexity  # noqa: F401

# multimodal decode (real WAV/PPM/BMP + from-scratch JPEG/PNG codecs
# and Y4M / MJPEG-AVI video containers)
from .operators.multimodal import extract_media_features  # noqa: F401

# sources: explicit-schema readers with corrupt-record quarantine,
# bucketed feature tables
from .sources.tables import (  # noqa: F401
    read_csv_table, read_jsonl, write_bucketed_table,
)

# streaming drift monitoring (didtool's psi as a live per-window monitor)
from .streaming.drift import CalibrationMonitor, PsiMonitor  # noqa: F401

# SVG rendering for the reference's matplotlib diagnostics (plot_roc,
# plot_ks, plot_pr_curve, ... — metric.py:313-756) without a GUI stack
from .functions.plots import (  # noqa: F401
    compare_roc, plot_distribution, plot_ks, plot_ks_in_cum,
    plot_ks_in_tpr_fpr, plot_layer_stability, plot_pr_curve,
    plot_pr_threshold, plot_psi, plot_roc,
)

# PMML 4.4 export of the encoders+trees scoring pipeline (the
# reference's need_pmml/sklearn2pmml path, model.py:282-304)
from .functions.pmml import export_pmml, model_to_pmml  # noqa: F401

# driver-side stdout tee (reference didtool/logger.py)
from .functions.utils import Logger  # noqa: F401
