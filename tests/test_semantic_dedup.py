"""Soundness/shape checks for ext_dedup_semantic (rows-only key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_pro3_spark.queries import all_queries

SF = "/root/testdata/sf0.01"


def test_semantic_dedup_sound_and_covering(spark):
    out = all_queries()["ext_dedup_semantic"](spark, SF)
    rows = out.collect()
    n = len(rows)
    kept = {r.vec_id for r in rows if r.is_kept == 1}
    dropped = {r.vec_id for r in rows if r.is_kept == 0}
    # one decision per vector, cells populated
    assert n == kept.__len__() + len(dropped)
    from dbt_pro3_spark.sources.readers import load

    assert n == load(spark, SF, "embeddings").count()
    assert len({r.cell for r in rows}) > 1

    # soundness (the exact contract the single-join rule provides): every
    # dropped vector has an exact cosine >= 0.4 neighbor with a SMALLER id
    # — kept OR dropped; under a similarity chain only the chain head is
    # kept (see the key's docstring). Verified with the exact all-pairs
    # primitive on the bounded corpus.
    from dbt_pro3_spark.ext.dedup import embedding_near_pairs

    emb = load(spark, SF, "embeddings")
    pairs = embedding_near_pairs(emb, threshold=0.4).collect()
    has_smaller_nbr = {p.vec_b for p in pairs}
    assert dropped <= has_smaller_nbr, (
        "semantic dedup dropped a vector with no cosine>=0.4 smaller-id "
        f"neighbor: {sorted(dropped - has_smaller_nbr)[:5]}"
    )
    # and it actually fires on this corpus (planted near-dups exist)
    assert dropped, "no vector was deduplicated — threshold/cells broken?"
