"""Winnowing guarantee test: any shared token run of length >= k + w - 1
must produce at least one shared fingerprint (the paper's core property),
and disjoint texts must produce none."""

from __future__ import annotations


def test_winnowing_guarantee(spark):
    from dbt_pro3_spark.queries.llm_ops import (
        WINNOW_K,
        WINNOW_MIN_SHARED,
        WINNOW_W,
        ext_text_winnowing,
    )
    import os
    import tempfile

    run = WINNOW_K + WINNOW_W - 1  # guaranteed-detection run length
    shared = " ".join(f"shared{i}" for i in range(run + WINNOW_K * WINNOW_MIN_SHARED))
    rows = [
        # docs 1 and 2 embed the same long run at DIFFERENT offsets
        (1, "alpha beta gamma " + shared + " delta epsilon zeta eta theta"),
        (2, "one two three four five six " + shared + " seven eight"),
        # doc 3 shares nothing
        (3, " ".join(f"unique{i}" for i in range(60))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {(r.doc_a, r.doc_b): r.n_shared for r in ext_text_winnowing(spark, d).collect()}
    assert (1, 2) in out, "shared run produced no winnowing match"
    assert all(3 not in pair for pair in out), "disjoint doc matched"
