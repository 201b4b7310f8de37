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
are the top of bench_detail.json (every key >= ~1.9 s at sf0.1) — the
ones where one extra corpus-sized shuffle costs real wall-clock at 100 TB.
Counts are measured in this module's exact execution conditions: session
caches cleared first (the autouse fixture below), keys planned in sorted
order at sf0.01 — re-measure the same way when updating a pin.
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


@pytest.fixture(scope="module", autouse=True)
def _cold_session_caches(spark):
    """Plan shape for the session-index families depends on cache warmth
    (see ext_graph_link_predict below), so start this module from a
    deterministic cold state: within-file test order is then the only
    warmth variable, making the pins reproducible standalone and in the
    full suite alike."""
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
    # 5 when link_predict itself builds the shared graph index; within
    # this module the alphabetical order warms it first (7 exchanges)
    "ext_graph_link_predict": 7,
    "ext_graph_modularity": 7,
    "ext_graph_triangles": 5,
    "ext_hurst_exponent": 2,
    "ext_item_cooccur_cosine": 7,
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


@pytest.mark.parametrize("name", sorted(_CEILINGS))
def test_shuffle_count_ceiling(spark, name):
    p = plan_str(_QUERIES[name](spark, SF_DIR))
    n = p.count(") Exchange")
    assert n <= _CEILINGS[name], (
        f"{name}: {n} Exchange operators in plan, ceiling is "
        f"{_CEILINGS[name]} — a shuffle crept back in:\n{p[:3000]}"
    )
