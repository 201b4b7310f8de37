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


def test_stream_outer_join_matches_batch(spark):
    """Left-outer stream-stream join: matched rows are identical to the
    batch join; unmatched views are null-padded exactly when the final
    watermark (max event time - 1 h delay) passes their join horizon
    (view_ts + 30 min). Views whose horizon the final watermark never
    reaches legitimately stay buffered — they are excluded from the
    must-be-present check but must not appear with fabricated matches."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dbt_pro3_spark.sources.readers import load

    streamed = all_queries()["ext_stream_outer_join"](spark, SF_DIR).collect()
    ev = (
        load(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type", "ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), F.col("ts").alias("view_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).collect()

    s_matched = {
        (r["user_id"], r["view_event_id"], r["purchase_event_id"])
        for r in streamed
        if r["purchase_event_id"] is not None
    }
    b_matched = {
        (r["user_id"], r["view_event_id"], r["purchase_event_id"])
        for r in batch
        if r["purchase_event_id"] is not None
    }
    assert s_matched == b_matched, (
        f"matched rows diverged: stream-only={len(s_matched - b_matched)}, "
        f"batch-only={len(b_matched - s_matched)}"
    )

    # The global watermark is the MIN across both watermark operators —
    # each sees only ITS filtered stream, so it's min(max view ts, max
    # purchase ts) - delay, not the overall event max (verified against
    # the observed eviction boundary).
    maxes = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .collect()
    )
    final_wm = min(r["m"] for r in maxes) - dt.timedelta(hours=1)
    s_unmatched = {r["view_event_id"] for r in streamed if r["purchase_event_id"] is None}
    b_unmatched = {r["view_event_id"] for r in batch if r["purchase_event_id"] is None}
    # no fabricated unmatched rows
    assert s_unmatched <= b_unmatched
    # every provably-expired unmatched view was flushed (1-min margin keeps
    # the assertion agnostic to >= vs > at the exact watermark boundary)
    must_flush = {
        r["view_event_id"]
        for r in batch
        if r["purchase_event_id"] is None
        and r["view_ts"] + dt.timedelta(minutes=31) < final_wm
    }
    assert must_flush <= s_unmatched, (
        f"{len(must_flush - s_unmatched)} expired views were never null-padded"
    )
