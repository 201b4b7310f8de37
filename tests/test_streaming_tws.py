"""transformWithStateInPandas (Spark 4 typed-state API) batch-equivalence.

The operator's Python driver worker needs google.protobuf, which the build
sandbox does not ship — the test self-skips there and runs everywhere else
(any standard Spark 4 deployment has protobuf via pyspark's deps).
"""

from __future__ import annotations

import importlib.util

import pytest

from .conftest import SF_DIR

try:
    protobuf_missing = importlib.util.find_spec("google.protobuf") is None
except ModuleNotFoundError:
    protobuf_missing = True


@pytest.mark.skipif(
    protobuf_missing,
    reason="transformWithStateInPandas needs google.protobuf (not in sandbox)",
)
def test_transform_with_state_matches_batch_groupby(spark):
    from pyspark.sql import functions as F

    from dbt_pro3_spark.sources.readers import load
    from dbt_pro3_spark.streaming.stateful import transform_with_state_user_profile

    prof = transform_with_state_user_profile(
        spark, f"{SF_DIR}/events.parquet"
    ).collect()
    batch = (
        load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").cast("int").alias("n_distinct_types"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("total_value"),
        )
        .collect()
    )
    s = {
        (r["user_id"], r["n_events"], r["n_distinct_types"], round(r["total_value"], 2))
        for r in prof
    }
    b = {
        (r["user_id"], r["n_events"], r["n_distinct_types"], round(r["total_value"], 2))
        for r in batch
    }
    assert s == b
