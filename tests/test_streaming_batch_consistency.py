"""Streaming keys whose semantics have an exact batch twin must produce the
SAME result set when run to completion with availableNow — the
batch-equivalence guarantee Structured Streaming makes for stateless /
fully-watermarked plans."""

from __future__ import annotations

from dbt_pro3_spark.queries import all_queries

from .conftest import SF_DIR


def test_stream_stream_join_matches_batch_interval_join(spark):
    qs = all_queries()
    streamed = qs["ext_stream_stream_join"](spark, SF_DIR).collect()
    batch = qs["join_range_interval"](spark, SF_DIR).collect()
    s = {(r["user_id"], r["view_event_id"], r["purchase_event_id"]) for r in streamed}
    b = {(r["user_id"], r["view_event_id"], r["purchase_event_id"]) for r in batch}
    assert s == b, (
        f"stream-stream join diverged from batch: stream-only={len(s - b)}, "
        f"batch-only={len(b - s)}"
    )


def test_stream_dedup_matches_batch_distinct(spark):
    from dbt_pro3_spark.sources.readers import load

    streamed = all_queries()["ext_stream_dedup"](spark, SF_DIR)
    n_stream = streamed.select("event_id").distinct().count(), streamed.count()
    n_batch = load(spark, SF_DIR, "events").select("event_id").distinct().count()
    # dedup output must be exactly the distinct event ids, no dup survivors
    assert n_stream[0] == n_stream[1] == n_batch
