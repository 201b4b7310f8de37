"""Custom stateful streaming operators.

The reference has zero streaming surface (SURVEY §2.K); these are the
driver-mandated extensions at their most Spark-native:

- ``running_user_totals``: arbitrary stateful aggregation with
  ``applyInPandasWithState`` — per-key state (count, sum) maintained by the
  engine's state store, Arrow-batched user code. This is the template for
  any custom stateful operator Spark lacks natively.
- ``stream_stream_view_purchase_join``: watermarked stream-stream interval
  join — both sides buffer bounded state; the watermark + range condition
  tell Spark when buffered rows can be dropped.
- ``stream_dedup``: dropDuplicatesWithinWatermark — exactly-once-ish event
  dedup with bounded state, the streaming twin of exact_dedup.

All run with the availableNow trigger against the events parquet so batch
tests can observe results; swap the source for Kafka and nothing else
changes.

Known cosmetic warning: applyInPandasWithState executors emit a pandas
FutureWarning from INSIDE pyspark (sql/pandas/serializers.py ~:1696) —
the state serializer pads the data/state sides to equal length with
all-NA frames before pd.concat, which pandas 2.x deprecates. No user
code path avoids it (the padding is unconditional whenever data and
state counts differ), and it is dtype-safe here: the merged frame is
immediately cast through the operator's explicit Arrow schema, so the
future pandas inference change cannot alter what reaches the engine.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..session import tune

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _events_stream(spark: SparkSession, events_path: str) -> DataFrame:
    from ..sources.readers import normalize_ts

    tune(spark)
    schema = spark.read.parquet(events_path).schema
    return normalize_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
    )


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    sink = f"st_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(sink)


def running_user_totals(spark: SparkSession, events_path: str) -> DataFrame:
    """Per-user running (count, sum) via applyInPandasWithState."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    stream = (
        _events_stream(spark, events_path)
        .select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )
    return _run_to_memory(stream, "update")


TWS_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, n_distinct_types int, total_value double"
)


def transform_with_state_user_profile(
    spark: SparkSession, events_path: str
) -> DataFrame:
    """Per-user profile via transformWithStateInPandas — Spark 4's
    successor to applyInPandasWithState, with TYPED state primitives
    instead of one opaque tuple: a ValueState for the (count, sum)
    accumulator plus a MapState keyed by event_type for the distinct-type
    set (the state shape a GROUP BY COUNT(DISTINCT) would need unbounded
    memory for in a true stream; the state store spills and checkpoints
    it). availableNow + update mode -> the final emission per user equals
    the batch GROUP BY, which is what the oracle checks.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")
            self.types = handle.getMapState("types", "t STRING", "one SMALLINT")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ARG002
            if self.totals.exists():
                n, total = self.totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
                for t in pdf["event_type"].dropna().unique():
                    self.types.updateValue((str(t),), (1,))
            self.totals.update((n, total))
            n_types = sum(1 for _ in self.types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_distinct_types": [n_types],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    stream = _events_stream(spark, events_path).select(
        "user_id", "event_type", "value"
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        UserProfile(), TWS_OUTPUT_SCHEMA, "Update", "None"
    )
    return _run_to_memory(out, "update")


def stream_stream_view_purchase_join(spark: SparkSession, events_path: str) -> DataFrame:
    """Watermarked stream-stream join: purchases within 30 min of a view by
    the same user. The batch oracle twin is queries.join_range_interval."""
    ev = _events_stream(spark, events_path)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("view_event_id"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("user_id", "view_event_id", "purchase_event_id", "view_ts", "purchase_ts")
    return _run_to_memory(joined, "append")


def stream_dedup(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark on event_id."""
    ev = _events_stream(spark, events_path).withWatermark("ts", "1 hour")
    deduped = ev.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_id", "user_id", "event_type", "ts"
    )
    return _run_to_memory(deduped, "append")


def stream_static_enrich(
    spark: SparkSession, events_path: str, dim: DataFrame
) -> DataFrame:
    """Stream-static join: enrich the event stream with a (broadcast)
    static dimension — the profile-lookup shape of every clickstream
    pipeline. Stateless on the stream side (no watermark needed: the static
    side is fully available each microbatch, Spark re-broadcasts it), so
    the result is deterministic and batch-equivalent — unlike the other
    streaming keys this one carries a full DuckDB oracle."""
    ev = _events_stream(spark, events_path)
    enriched = ev.join(
        F.broadcast(dim), ev.user_id == dim.c_custkey, "left"
    ).select("event_id", "user_id", "event_type", "value", "c_mktsegment")
    return _run_to_memory(enriched, "append")


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, closed_by_timeout boolean"
)
SESSION_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def sessionize_with_timeout(
    spark: SparkSession, events_path: str, gap_minutes: int = 30
) -> DataFrame:
    """Custom sessionization with EVENT-TIME TIMEOUT state: per-user session
    state (start, end, count) is extended by in-gap events and EMITTED BY
    THE ENGINE when the watermark passes end + gap — the state-store
    pattern F.session_window can't express once per-session custom logic is
    needed (e.g. emit-once with a closure reason). State is bounded: one
    (user, open-session) row, reclaimed at timeout; exactly the
    applyInPandasWithState timeout contract a production sessionizer uses.

    With the availableNow trigger the final watermark closes every session,
    so the batch-observable output is one row per (user, gap-session) —
    counts line up with ext_session_window's batch sessionization (asserted
    in tests/test_streaming_sessions.py)."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        gap_us = gap_minutes * 60 * 1_000_000
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "closed_by_timeout": [True],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
        ts_us = ts_us.sort_values()
        out = []
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = None, None, 0
        for t in ts_us:
            if start_us is None:
                start_us, end_us, n = int(t), int(t), 1
            elif t - end_us < gap_us:
                end_us, n = max(end_us, int(t)), n + 1
            else:
                out.append((start_us, end_us, n, False))
                start_us, end_us, n = int(t), int(t), 1
        state.update((start_us, end_us, n))
        state.setTimeoutTimestamp(end_us // 1000 + gap_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in out],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in out],
                    "n_events": [n_ for _, _, n_, _ in out],
                    "closed_by_timeout": [c for _, _, _, c in out],
                }
            )

    stream = (
        _events_stream(spark, events_path)
        .withWatermark("ts", "10 minutes")
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    return _run_to_memory(stream, "append")


def stream_stream_left_outer_join(spark: SparkSession, events_path: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: every view is emitted —
    matched views as soon as the purchase arrives, UNMATCHED views only
    once the watermark passes their join-eligibility horizon (view_ts +
    30 min + 1 h delay), when the engine can prove no future purchase can
    match and null-pads them. This is the semantically hard outer-join
    shape: correctness depends on state eviction timing, not just the
    predicate. State is bounded on both sides by the watermark; the final
    no-data microbatch (spark.sql.streaming.noDataMicroBatches.enabled,
    on by default) flushes the last unmatched rows so an availableNow run
    is batch-equivalent (asserted in tests/test_streaming_batch_consistency.py)."""
    ev = _events_stream(spark, events_path)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("view_event_id"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select("user_id", "view_event_id", "purchase_event_id", "view_ts", "purchase_ts")
    return _run_to_memory(joined, "append")
