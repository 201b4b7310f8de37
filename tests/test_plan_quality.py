"""Plan-quality regression guard: every oracle-keyed query's physical plan
is scanned for red flags. A query can pass value-parity with a terrible
plan — this test is what keeps the plans the ones we'd want at 100 TB.

- No CartesianProduct anywhere (the scalar 1x1 cross join compiles to a
  broadcast nested-loop, which is fine and expected).
- Non-equi pair joins (cosine/topk) must broadcast one side — a
  CartesianProduct there would be the O(n²) disaster shape.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from dbt_pro3_spark.queries import all_oracle, all_queries

from .conftest import SF_DIR

_QUERIES = all_queries()
# lazy-plan keys only: oracle-keyed queries return unexecuted DataFrames
_PLAN_KEYS = sorted(set(all_oracle()))


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", _PLAN_KEYS)
def test_no_cartesian_product(spark, name):
    p = plan_str(_QUERIES[name](spark, SF_DIR))
    assert "CartesianProduct" not in p, f"{name} plans a CartesianProduct:\n{p[:2000]}"


def test_pushdown_reaches_scans(spark):
    """Spot-proof that selective filters reach the parquet scans."""
    cases = {
        "pred_between": "GreaterThanOrEqual(p_size,10)",
        "q_shipping_priority": "EqualTo(c_mktsegment,BUILDING)",
        "q_returned_item_ranking": "EqualTo(l_returnflag,R)",
    }
    for name, fragment in cases.items():
        p = plan_str(_QUERIES[name](spark, SF_DIR))
        assert fragment in p, f"{name}: pushed filter missing\n{p[:2000]}"


def test_column_pruning_reaches_scans(spark):
    """The flagship reads exactly the columns it needs from each table."""
    p = plan_str(_QUERIES["flagship_exec_summary"](spark, SF_DIR))
    assert "ReadSchema: struct<o_custkey:bigint,o_totalprice:double,o_orderdate" in p
    assert "ReadSchema: struct<l_extendedprice:double,l_discount:double,l_shipdate" in p


def test_embedding_dedup_has_no_all_pairs_join(spark):
    """ext_dedup_embedding must block through LSH band equi-joins — a
    BroadcastNestedLoopJoin/CartesianProduct there is the O(n²) shape the
    banding exists to avoid (the _exact twin is the only sanctioned one)."""
    p = plan_str(_QUERIES["ext_dedup_embedding"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p, f"all-pairs join in plan:\n{p[:2000]}"


def test_blocked_edit_distance_has_no_all_pairs_join(spark):
    p = plan_str(_QUERIES["ext_text_edit_distance_blocked"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p, f"all-pairs join in plan:\n{p[:2000]}"


def test_scan_partition_pruned_prunes(spark):
    """The month predicate must land as a partition filter on the scan of
    the partitioned materialization (1 of ~80 directories), not a row
    filter after reading everything."""
    df = _QUERIES["scan_partition_pruned"](spark, SF_DIR)
    p = plan_str(df)
    scans = [
        ln for ln in p.splitlines() if "PartitionFilters" in ln and "o_month" in ln
    ]
    assert scans, f"partition filter on o_month missing:\n{p[:2000]}"


def test_chunk_prunes_and_stays_narrow(spark):
    """ext_text_chunk must read ONLY (doc_id, text) — pruning pushes
    through the sequence/explode fan-out — and must not shuffle (the chunk
    expansion is a narrow transform)."""
    p = plan_str(_QUERIES["ext_text_chunk"](spark, SF_DIR))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p, p[:1500]
    assert ") Exchange" not in p, f"chunking should be shuffle-free:\n{p[:1500]}"


def test_pii_redact_stays_narrow(spark):
    """Regex scrub is a pure map — no Exchange anywhere in the plan."""
    p = plan_str(_QUERIES["ext_text_pii_redact"](spark, SF_DIR))
    assert ") Exchange" not in p, p[:1500]


def test_repetition_single_shuffle(spark):
    """Both aggregations key on doc_id, so the second reuses the first's
    hash partitioning: exactly one Exchange (plus none for the scan)."""
    p = plan_str(_QUERIES["ext_text_repetition"](spark, SF_DIR))
    n_exchange = p.count(") Exchange")
    assert n_exchange <= 2, f"expected <=2 exchanges (spread + doc_id), got {n_exchange}:\n{p[:2000]}"


def test_zorder_key_stays_narrow(spark):
    p = plan_str(_QUERIES["scan_zorder_key"](spark, SF_DIR))
    assert ") Exchange" not in p, p[:1500]
    assert "PushedFilters: [IsNotNull(l_linenumber), EqualTo(l_linenumber,1)]" in p, p[:1500]


def test_decontaminate_broadcasts_benchmark(spark):
    """The eval-set n-gram side must broadcast — a shuffled contamination
    join would move the corpus gram set for a KB-sized benchmark."""
    p = plan_str(_QUERIES["ext_text_decontaminate"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p


def test_quality_filter_broadcasts_cuts(spark):
    """Per-language percentile cuts (rows == languages) broadcast back."""
    p = plan_str(_QUERIES["ext_quality_filter"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p


def test_pack_has_no_corpus_wide_window(spark):
    """Sequence packing's local cumsum windows must be partitioned by the
    doc_id-range bucket; the only unpartitioned sort feeds the tiny
    bucket-subtotal scan, never the corpus."""
    p = plan_str(_QUERIES["ext_text_pack"](spark, SF_DIR))
    # the corpus-side window sorts within hash-partitioned buckets
    assert "hashpartitioning(bucket" in p
    # and the offsets join arrives broadcast
    assert "BroadcastHashJoin" in p


def test_unigram_xent_broadcasts_vocab(spark):
    p = plan_str(_QUERIES["ext_text_unigram_xent"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p


def test_dup_ngram_spans_single_gram_pipeline(spark):
    """The fused multi-distinct aggregate must keep the heavy gram probe
    join to ONE instance in the plan (the split-aggregate form planted
    two), and nothing may fall back to a non-equi join."""
    p = plan_str(_QUERIES["ext_text_dup_ngram_spans"](spark, SF_DIR))
    assert p.count("SortMergeJoin") == 0
    assert "BroadcastNestedLoopJoin" not in p


def test_curation_pipeline_broadcasts_cuts(spark):
    """The per-language percentile cut and the final enrich joins must be
    broadcast; the only shuffles are the dedup window hash and the report
    aggregate."""
    p = plan_str(_QUERIES["ext_curation_pipeline"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_countmin_probe_is_broadcast(spark):
    """The d*w sketch table must arrive at the probe as a broadcast —
    shuffling the keyed side against a <=768-row sketch would be wrong."""
    p = plan_str(_QUERIES["ext_sketch_countmin"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_basket_pairs_is_equi_join(spark):
    """Pair generation must be an equi-join on the order key (bounded by
    items-per-order choose 2) — never a nested-loop over parts."""
    p = plan_str(_QUERIES["ext_basket_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p


def test_length_bucket_batch_no_global_window(spark):
    """The corpus-side row_number window must be partitioned by
    (seq_len, sub) — the two-level scan leaves no corpus-wide,
    unpartitioned row-number anywhere in the plan."""
    p = plan_str(_QUERIES["ext_length_bucket_batch"](spark, SF_DIR))
    rn_lines = [ln for ln in p.split("\n") if "row_number()" in ln]
    assert rn_lines, p[:1500]
    for ln in rn_lines:
        assert "windowspecdefinition(seq_len" in ln, ln[:300]
        assert ", sub#" in ln, ln[:300]


def test_event_transition_single_user_shuffle(spark):
    """The lag window and the pair aggregate reuse/derive from the
    user-partitioned shuffle; totals broadcast back."""
    p = plan_str(_QUERIES["ext_event_transition"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_churn_features_scalar_broadcast_only(spark):
    """The 'now' anchor rides a 1-row BroadcastNestedLoopJoin; the feature
    aggregate itself is one user-keyed hash aggregate."""
    p = plan_str(_QUERIES["ext_user_churn_features"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "HashAggregate" in p


def test_pca_gram_stage_has_no_join(spark):
    """The corpus-sized Gram stage must be generate+aggregate only — the
    only joins in the PCA plan are on d^2-row matrix frames (hash or
    broadcast), never a corpus-side join or cartesian."""
    p = plan_str(_QUERIES["ext_embed_pca_power"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    # the Gram stage itself sits behind a lazy localCheckpoint (lineage
    # truncated in explain); its generate+aggregate shape is asserted by
    # construction in _pca_eigvec and exercised by the parity suite


def test_centroid_classify_broadcasts_grid(spark):
    """The #labels x d centroid grid must broadcast against the corpus
    explode — a shuffle join there would re-shuffle the corpus."""
    p = plan_str(_QUERIES["ext_embed_centroid_classify"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_pca_project_broadcasts_eigvec(spark):
    """The 64-row eigenvector must broadcast into the projection pass."""
    p = plan_str(_QUERIES["ext_embed_pca_project"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_target_encode_broadcasts_category_grid(spark):
    """The category grid and the global totals must both broadcast —
    the fact table is scanned once with per-row expressions only."""
    p = plan_str(_QUERIES["ext_target_encode_loo"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "Window" not in p  # no window anywhere in this key


def test_session_attribution_single_user_sort(spark):
    """All four windows must share one user-keyed sort: the plan carries
    exactly one shuffle of the events table (plus the final grid agg)."""
    p = plan_str(_QUERIES["ext_session_attribution"](spark, SF_DIR))
    assert p.count("Exchange hashpartitioning(user_id") <= 1


def test_prefix_filter_has_no_window(spark):
    """Round-7 rewrite guard: PPJoin's rarity rank/prefix selection runs
    in-row over the packed per-doc struct array — a Window node
    re-appearing means the per-doc row_number sort crept back in."""
    p = plan_str(_QUERIES["ext_dedup_prefix_filter"](spark, SF_DIR))
    assert "Window" not in p, f"rank window back in PPJoin plan:\n{p[:2000]}"


def test_winnowing_has_no_window(spark):
    """Round-7 rewrite guard: winnowing's sliding minima are in-row
    array ops; the doc-partitioned window shuffle must stay gone."""
    p = plan_str(_QUERIES["ext_text_winnowing"](spark, SF_DIR))
    assert "Window" not in p, f"window back in winnowing plan:\n{p[:2000]}"


def test_dup_ngram_spans_has_no_expand(spark):
    """Round-7 rewrite guard: both aggregates plan WITHOUT Expand — the
    df>=2 test is min!=max and only one distinct column remains."""
    p = plan_str(_QUERIES["ext_text_dup_ngram_spans"](spark, SF_DIR))
    assert "Expand" not in p, f"Expand back in dup-span plan:\n{p[:2000]}"


def test_rake_has_no_window_before_topk(spark):
    """Round-7 rewrite guard: RAKE builds phrases in-row; the only
    windows allowed are the two bounded top-k ranking windows."""
    p = plan_str(_QUERIES["ext_text_rake"](spark, SF_DIR))
    # formatted explain names each node once in the tree and once in the
    # detail section — count detail headers "(id) Window"
    import re

    n_windows = len(re.findall(r"\(\d+\) Window(?!\w)", p))
    assert n_windows <= 2, f"{n_windows} windows in RAKE plan:\n{p[:2000]}"
