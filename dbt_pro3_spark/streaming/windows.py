"""Event-time window aggregations.

F.window / F.session_window work identically in batch and streaming — the
batch forms here are oracle-checkable; the streaming variant (watermark.py)
reuses the same expressions on a readStream source.

Scale: windowed aggregation shuffles on (window, keys); tumbling windows
partition time disjointly, sliding windows fan each row out window/slide
times BEFORE the shuffle (cost multiplier — keep slide ≥ window/4 at scale).
Session windows need a per-key merge, which Spark implements with a
sort-within-partition after a key shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame, ts_col: str = "ts", duration: str = "10 minutes", keys: list[str] | None = None
) -> DataFrame:
    """Per-tumbling-window counts/sums (epoch-aligned, like DuckDB
    time_bucket)."""
    gb = [F.window(F.col(ts_col), duration).alias("win")] + [F.col(k) for k in (keys or [])]
    return (
        df.groupBy(*gb)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            *[F.col(k) for k in (keys or [])],
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """Sliding-window counts: each event contributes to duration/slide
    overlapping windows."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: a session closes after ``gap`` of silence
    (session start = first event ts — matches the gaps-and-islands SQL
    formulation with a `diff >= gap` new-session flag)."""
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            key,
            F.col("win.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
