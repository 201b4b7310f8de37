"""Pin Spark's watermark-eviction strict/non-strict inequalities.

The streaming oracles encode these boundaries (ADVICE r02 #3):
- tumbling append-mode emission is NON-strict: a window is emitted when
  window_end <= watermark (equality emits);
- EventTimeTimeout state timeout is STRICT: state times out only when
  timeoutTimestamp < watermark (equality does NOT fire).

These tests synthesize events that land EXACTLY on the boundary, so if a
Spark upgrade (or a driver-testdata regeneration that happens to hit a
boundary) flips either inequality, the failure happens here with a named
inequality — not as an opaque driver hash mismatch.
"""

from __future__ import annotations

import datetime as dt

import pytest


def _write_events(spark, path, rows):
    """rows: list of (event_id, ts_str, user_id, event_type)."""
    df = spark.createDataFrame(
        [
            (i, dt.datetime.fromisoformat(ts), u, et, 1.0, "{}")
            for (i, ts, u, et) in rows
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_tumbling_emission_is_nonstrict_at_window_end(spark, tmp_path):
    """final watermark = max_ts - delay = 00:20:00; the [00:10, 00:20)
    window's end equals the watermark exactly -> MUST be emitted
    (window_end <= w). The watermark-driver's own window must not be."""
    from dbt_pro3_spark.streaming.watermark import windowed_stream_counts

    path = str(tmp_path / "ev")
    _write_events(
        spark,
        path,
        [
            (0, "2024-01-01T00:05:00", 1, "a"),
            (1, "2024-01-01T00:15:00", 1, "a"),
            (2, "2024-01-01T00:30:00", 1, "b"),  # watermark driver
        ],
    )
    out = windowed_stream_counts(
        spark, f"{path}/" + _one_parquet(path),
        watermark_delay="10 minutes", duration="10 minutes",
    )
    starts = {r.window_start.strftime("%H:%M") for r in out.collect()}
    assert "00:10" in starts, (
        "window_end == watermark was NOT emitted: Spark's append emission "
        "became strict; update the <= in the ext_watermark_stream oracle"
    )
    assert "00:00" in starts
    assert "00:30" not in starts, (
        "open window emitted: watermark no longer gates append emission"
    )


def test_event_time_timeout_is_strict_at_horizon(spark, tmp_path):
    """Session horizon (session_end + gap) == final watermark must NOT fire
    the timeout (strict <); a horizon strictly below the watermark must."""
    from dbt_pro3_spark.streaming.stateful import sessionize_with_timeout

    path = str(tmp_path / "ev")
    _write_events(
        spark,
        path,
        [
            # user 1: horizon = 00:00 + 30 min = 00:30 == watermark -> open
            (0, "2024-01-01T00:00:00", 1, "a"),
            # user 3: horizon = 23:30 < 00:30 -> times out, emitted
            (1, "2023-12-31T23:00:00", 3, "a"),
            # user 2 drives the watermark to 00:40 - 10 min = 00:30
            (2, "2024-01-01T00:40:00", 2, "a"),
        ],
    )
    out = sessionize_with_timeout(
        spark, f"{path}/" + _one_parquet(path), gap_minutes=30
    )
    emitted = {r.user_id for r in out.collect()}
    assert 3 in emitted, "horizon < watermark did not time out"
    assert 1 not in emitted, (
        "horizon == watermark fired the timeout: EventTimeTimeout became "
        "non-strict; update the < in the ext_stream_session_timeout oracle"
    )


def _one_parquet(d):
    import os

    return next(f for f in os.listdir(d) if f.endswith(".parquet"))
