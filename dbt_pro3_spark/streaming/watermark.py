"""Structured Streaming with watermarked late-data handling.

The reference has no streaming surface (SURVEY §2.K); this is the
driver-mandated extension. The pipeline shape is the production one:
readStream → event-time watermark → windowed aggregation → sink, run here
with the availableNow trigger (process-everything-then-stop) and a memory
sink so batch tests can observe the result.

Watermark semantics: in append mode a window is emitted only once the
watermark (max event time − delay) passes its end — late rows beyond the
delay are dropped instead of corrupting closed windows. That is exactly the
100 TB posture: bounded state, no unbounded window buffering.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_stream_counts(
    spark: SparkSession,
    events_path: str,
    watermark_delay: str = "10 minutes",
    duration: str = "10 minutes",
) -> DataFrame:
    """Stream the events parquet, watermark on event time, count per
    (tumbling window, event_type); return the collected result DataFrame.

    Schema is pinned from the batch reader (ts arrives as nanos-long, see
    sources.readers), converted to a proper timestamp before watermarking.
    """
    from ..session import tune

    import os

    tune(spark)
    schema = spark.read.parquet(events_path).schema
    # readStream needs a directory source; glob-filter to the events file
    from ..sources.readers import normalize_ts

    stream = (
        normalize_ts(
            spark.readStream.schema(schema)
            .option("pathGlobFilter", os.path.basename(events_path))
            .parquet(os.path.dirname(events_path))
        )
        .withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", duration).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    sink = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
