"""Per-key shuffle-count ceilings for the heaviest bench keys.

The wall-clock bench (bench.py) can hide a plan regression on a quiet
host: a rewrite that re-introduces a shuffle the session-index batches
removed may still land under the 2x envelope. This suite pins the number
of Exchange operators in each heavy key's physical plan to the value the
round-8 plan audit measured, so any rewrite that adds a shuffle fails
loudly with the plan diff in hand.

Ceilings are EXACT current counts (sf0.01 plans; Exchange node count is
partition-count-independent). If a legitimate rewrite changes a count,
re-measure and update the pin in the same commit — the point is that the
change is deliberate, reviewed, and recorded, never silent. Keys covered
are the top 128 of bench_detail.json (every key >= ~0.97 s at sf0.1:
_CEILINGS is ranks 1-64, _CEILINGS_TIER2 ranks 65-128) — the ones where
one extra corpus-sized shuffle costs real wall-clock at 100 TB.
Counts are warmth- and order-independent: the autouse fixture below
clears every session cache BEFORE EACH KEY, so each key plans from a
deterministic cold state whether the module runs alphabetically, under
pytest-xdist distribution, or via -k single-test selection (ADVICE r8:
exact pins measured at one warmth are not reproducible under subset
selection). Re-measure with the same per-key cold clearing when updating
a pin (scripts pattern: clear all four caches, plan, count ") Exchange").
"""

from __future__ import annotations

import pytest

from dbt_pro3_spark.queries import all_queries

from .conftest import SF_DIR
from .test_plan_quality import plan_str

_QUERIES = all_queries()

# Ceilings are measured at the default sf0.01: at a much larger SF the
# broadcast-threshold heuristics can flip joins to sort-merge and add
# exchanges, which is a planner policy change, not a regression.
pytestmark = pytest.mark.skipif(
    not SF_DIR.endswith("sf0.01"),
    reason="shuffle ceilings are pinned against the default sf0.01 plans",
)


@pytest.fixture(autouse=True)
def _cold_session_caches(spark):
    """Plan shape for the session-index families depends on cache warmth
    (a warm shared graph index planned through its persisted lineage adds
    exchanges vs a cold build), so clear every cache before EACH key: the
    pinned count is then a property of the key alone, not of which tests
    ran first — reproducible standalone, under -k selection, and under
    pytest-xdist alike (ADVICE r8)."""
    from dbt_pro3_spark.ext.graph import clear_graph_cache
    from dbt_pro3_spark.ext.ivf import clear_ivf_cache
    from dbt_pro3_spark.queries.r4_ops import clear_pca_cache
    from dbt_pro3_spark.queries.r4d_ops import clear_probe_cache

    clear_graph_cache()
    clear_ivf_cache()
    clear_pca_cache()
    clear_probe_cache()
    yield


# key -> max ") Exchange" occurrences in df.explain("formatted")
_CEILINGS = {
    "agg_groupby_multikey": 1,
    "ext_abc_xyz_matrix": 10,
    "ext_ann_pq": 1,
    "ext_assoc_rules": 6,
    "ext_attr_markov_removal": 0,
    "ext_basket_pairs": 5,
    "ext_bootstrap_ci": 3,
    "ext_brand_customer_overlap": 5,
    "ext_cluster_silhouette": 5,
    "ext_cogroup_reconcile": 3,
    "ext_conformal_interval": 5,
    "ext_cramers_v": 4,
    "ext_croston_forecast": 2,
    "ext_dedup_chunk_fuzzy": 1,
    "ext_dedup_embedding": 1,
    "ext_dedup_incremental_fuzzy": 1,
    "ext_dedup_minhash_est": 1,
    "ext_dedup_ngram_jaccard": 10,
    "ext_dedup_prefix_filter": 1,
    "ext_dedup_recall_audit": 5,
    "ext_dedup_scurve": 7,
    "ext_dedup_simhash": 1,
    "ext_demand_xyz": 2,
    "ext_dsir_resample": 7,
    "ext_embed_centroid_classify": 5,
    "ext_embed_knn_classify": 3,
    "ext_embed_mmr_select": 1,
    "ext_embed_reciprocal_nn": 2,
    "ext_exact_quantiles_twopass": 10,
    "ext_fk_discovery": 27,
    "ext_graph_bfs_reach": 9,
    "ext_graph_hits": 14,
    "ext_graph_kcore": 10,
    "ext_graph_label_prop": 16,
    "ext_graph_link_predict": 5,
    "ext_graph_modularity": 7,
    "ext_graph_triangles": 5,
    "ext_hurst_exponent": 2,
    "ext_item_cooccur_cosine": 6,
    "ext_join_size_estimate": 5,
    "ext_kmeans_lloyd": 4,
    "ext_lof_outliers": 4,
    "ext_lsh_bucket_stats": 3,
    "ext_markov_absorption": 0,
    "ext_mcnemar_test": 13,
    "ext_nb_langid": 14,
    "ext_pacf": 12,
    "ext_partition_skew_report": 3,
    "ext_permutation_test": 2,
    "ext_pref_bradley_terry": 10,
    "ext_price_dispersion": 1,
    "ext_price_elasticity": 3,
    "ext_price_volume_mix": 5,
    "ext_qte": 4,
    "ext_retrieval_ndcg": 5,
    "ext_seq_basket_pairs": 3,
    "ext_shift_share": 5,
    "ext_spearman_corr": 6,
    "ext_text_doc_novelty": 3,
    "ext_text_dup_ngram_spans": 3,
    "ext_text_loss_mask": 3,
    "ext_text_winnowing": 3,
    "ext_trend_ols": 2,
    "sink_codec_roundtrip": 0,
}


# Second tier (round 9): the NEXT 64 bench keys by sf0.1 cost
# (bench_detail.json ranks 65-128, ~0.97-1.9 s each). Same contract and
# measurement conditions as _CEILINGS (per-key cold caches, sf0.01).
# Together the two tables plan-pin the entire >=0.97 s head of the
# 339-key bench — a silent shuffle regression anywhere in it fails fast.
_CEILINGS_TIER2 = {
    "ext_ann_ivf": 1,
    "ext_ann_lsh": 1,
    "ext_attr_shapley": 3,
    "ext_burrows_delta": 5,
    "ext_calibration_temperature": 1,
    "ext_cluster_validity": 12,
    "ext_cochran_q": 12,
    "ext_curation_pipeline": 3,
    "ext_dedup_semantic": 2,
    "ext_design_effect": 1,
    "ext_embed_cka_views": 16,
    "ext_embed_matryoshka_audit": 5,
    "ext_embed_outlier_knn": 1,
    "ext_eval_cv_auc": 1,
    "ext_eval_lift": 2,
    "ext_exact_quantiles_grouped": 7,
    "ext_feature_mi": 4,
    "ext_fit_negbinom": 8,
    "ext_fleiss_kappa": 6,
    "ext_forecast_reconcile": 9,
    "ext_gini_feature_importance": 4,
    "ext_granger_causality": 2,
    "ext_hclust_single_link": 4,
    "ext_incremental_delete": 1,
    "ext_ipf_raking": 1,
    "ext_jl_projection": 4,
    "ext_jonckheere_trend": 4,
    "ext_kruskal_wallis": 7,
    "ext_levene_bf": 4,
    "ext_linkage_patterns": 2,
    "ext_mann_kendall": 4,
    "ext_metric_cuped": 3,
    "ext_neyman_allocation": 2,
    "ext_part_vintage_revenue": 3,
    "ext_peak_concurrency": 7,
    "ext_privacy_t_closeness": 6,
    "ext_qq_points": 4,
    "ext_rank_effect_stats": 8,
    "ext_recursive_hierarchy": 1,
    "ext_rerank_rrf": 5,
    "ext_retrieval_mrr": 4,
    "ext_retrieval_recall": 3,
    "ext_revenue_waterfall": 3,
    "ext_runs_test": 1,
    "ext_session_path_topk": 5,
    "ext_simpson_screen": 2,
    "ext_sketch_ams_f2": 3,
    "ext_sketch_kmv_setops": 7,
    "ext_source_js_divergence": 3,
    "ext_source_overlap": 3,
    "ext_tail_dependence": 15,
    "ext_text_collocations": 4,
    "ext_text_decontaminate": 5,
    "ext_text_dup_span_remove": 2,
    "ext_text_heaps_law": 6,
    "ext_text_rake": 3,
    "ext_text_vocab_coverage": 3,
    "ext_theil_decomposition": 4,
    "ext_ts_rolling_corr": 2,
    "ext_two_sample_ks": 10,
    "ext_udtf_installments": 2,
    "ext_weighted_quantiles": 5,
    "ext_wilcoxon_signed_rank": 4,
    "src_python_datasource": 1,
}

_ALL_CEILINGS = {**_CEILINGS, **_CEILINGS_TIER2}


@pytest.mark.parametrize("name", sorted(_ALL_CEILINGS))
def test_shuffle_count_ceiling(spark, name):
    p = plan_str(_QUERIES[name](spark, SF_DIR))
    n = p.count(") Exchange")
    assert n <= _ALL_CEILINGS[name], (
        f"{name}: {n} Exchange operators in plan, ceiling is "
        f"{_ALL_CEILINGS[name]} — a shuffle crept back in:\n{p[:3000]}"
    )
