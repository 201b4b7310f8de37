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
    "ext_dedup_prefix_filter": 1,
    # 5 when link_predict itself builds the shared graph index, 7 when a
    # sibling key warmed it first (the wedge enumeration then re-reads the
    # persisted basket frame on two branches) — pin the order-robust max
    "ext_graph_link_predict": 7,
    "ext_graph_kcore": 10,
    "ext_pref_bradley_terry": 10,
    "ext_permutation_test": 2,
    "ext_bootstrap_ci": 3,
    "ext_ann_pq": 1,
    "ext_seq_basket_pairs": 3,
    "ext_graph_hits": 14,
    "ext_dedup_ngram_jaccard": 10,
    "ext_lof_outliers": 4,
    "ext_dedup_scurve": 7,
    "ext_graph_label_prop": 16,
    "ext_item_cooccur_cosine": 7,
    "ext_graph_modularity": 7,
    "ext_retrieval_ndcg": 5,
    "ext_dedup_recall_audit": 5,
    "ext_embed_mmr_select": 1,
    "ext_dedup_embedding": 1,
    "ext_dedup_simhash": 1,
    "ext_assoc_rules": 7,
    "ext_brand_customer_overlap": 5,
    "ext_dedup_chunk_fuzzy": 1,
    "ext_cogroup_reconcile": 3,
    "ext_dedup_minhash_est": 1,
    "ext_attr_markov_removal": 0,
    "ext_basket_pairs": 6,
    "ext_fk_discovery": 27,
    "agg_groupby_multikey": 1,
    "ext_embed_reciprocal_nn": 2,
    "ext_graph_triangles": 5,
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
