"""Lifecycle contract for the session-shared IVF index
(ext/ivf.py:_IVF_CACHE) used by ext_ann_ivf / ext_ann_pq /
ext_dedup_semantic — same single-entry-eviction rules as the other
session caches (probe, graph, PCA)."""

from __future__ import annotations

from dbt_pro3_spark.ext.ivf import (
    _IVF_CACHE,
    clear_ivf_cache,
    medoid_seeds,
    shared_cell_index,
    shared_medoid_seeds,
)

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def _emb_fn(spark, sf_dir):
    return lambda: spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_cache_memoizes_and_holds_one_entry(spark):
    clear_ivf_cache()
    seeds = shared_medoid_seeds(spark, SF1, _emb_fn(spark, SF1), k=16)
    assert len(_IVF_CACHE) == 1
    assert shared_medoid_seeds(spark, SF1, _emb_fn(spark, SF1), k=16) is seeds
    cents, cells = shared_cell_index(spark, SF1, _emb_fn(spark, SF1), k=16)
    assert cents is seeds, "cell index must reuse the cached seed set"
    assert len(_IVF_CACHE) == 1
    assert cells.storageLevel.useMemory, "cell index must be persisted"
    _, cells2 = shared_cell_index(spark, SF1, _emb_fn(spark, SF1), k=16)
    assert cells2 is cells
    # a different sf_dir EVICTS the old entry
    other = shared_medoid_seeds(spark, SF2, _emb_fn(spark, SF2), k=16)
    assert len(_IVF_CACHE) == 1
    assert other is not seeds
    clear_ivf_cache()
    assert len(_IVF_CACHE) == 0


def test_shared_seeds_match_uncached_builder(spark):
    clear_ivf_cache()
    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    cached = shared_medoid_seeds(spark, SF1, _emb_fn(spark, SF1), k=16)
    plain = medoid_seeds(emb, k=16)
    assert cached == plain
    # the cached cell assignment covers the whole corpus exactly once
    _, cells = shared_cell_index(spark, SF1, _emb_fn(spark, SF1), k=16)
    assert cells.count() == emb.count()
    n_cells = cells.select("cell").distinct().count()
    assert 1 <= n_cells <= 16
    clear_ivf_cache()
