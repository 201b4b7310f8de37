"""Batch-consistency for the event-time-timeout sessionizer: every emitted
streaming session must match a batch gaps-and-islands session exactly
(same user, start, event count), and coverage must be near-total — only
sessions still inside the final watermark horizon may be missing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_pro3_spark.queries import all_queries

from .conftest import SF_DIR


def test_stream_sessions_match_batch(spark):
    qs = all_queries()
    streamed = qs["ext_stream_session_timeout"](spark, SF_DIR).collect()
    batch = qs["ext_session_window"](spark, SF_DIR).collect()
    b = {(r["user_id"], r["session_start"], r["n_events"]) for r in batch}
    s = {(r["user_id"], r["session_start"], r["n_events"]) for r in streamed}
    missing_from_batch = s - b
    assert not missing_from_batch, f"streaming emitted sessions batch never saw: {sorted(missing_from_batch)[:5]}"
    # append-mode can only lose sessions newer than the final watermark
    coverage = len(s) / len(b)
    assert coverage > 0.95, f"only {coverage:.1%} of batch sessions emitted"
