"""SCD Type-2 snapshots — dbt's `snapshot` materialization, absent from the
reference but part of the dbt capability family its users expect.

``apply_snapshot`` maintains a history table with validity windows:
- new keys            -> inserted as current (valid_from = batch ts);
- changed rows        -> old version closed (valid_to = batch ts,
                         is_current = false), new version inserted;
- unchanged / absent  -> untouched (absence is not deletion).

Change detection is dbt's "check" strategy: any of ``check_cols`` differs
(null-safe). Storage uses the same atomic version-pointer scheme as
plans/incremental.py; on a real cluster this maps onto a Delta/Iceberg
MERGE with the identical WHEN MATCHED / NOT MATCHED branches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental import _current_version, _swap_to, read_incremental

META = ["valid_from", "valid_to", "is_current"]


def _with_meta(batch: DataFrame, ts: str) -> DataFrame:
    return (
        batch.withColumn("valid_from", F.lit(ts).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def apply_snapshot(
    spark: SparkSession,
    base: str,
    batch: DataFrame,
    unique_key: str,
    check_cols: list[str],
    batch_ts: str,
) -> DataFrame:
    """Apply one snapshot batch at logical time ``batch_ts``; returns the
    full history table (current + closed versions)."""
    os.makedirs(base, exist_ok=True)
    existing = read_incremental(spark, base)
    cur = _current_version(base)
    next_v = f"v_{(int(cur[2:]) + 1) if cur else 0}"

    if existing is None:
        out = _with_meta(batch, batch_ts)
    else:
        current = existing.filter(F.col("is_current"))
        closed = existing.filter(~F.col("is_current"))
        b = batch.alias("b")
        c = current.alias("c")
        joined = c.join(b, F.col(f"c.{unique_key}") == F.col(f"b.{unique_key}"), "full")
        changed_cond = F.lit(False)
        for col in check_cols:
            changed_cond = changed_cond | ~F.col(f"c.{col}").eqNullSafe(F.col(f"b.{col}"))
        is_new = F.col(f"c.{unique_key}").isNull()
        is_gone = F.col(f"b.{unique_key}").isNull()

        untouched = joined.filter(~is_gone & ~is_new & ~changed_cond).select("c.*")
        absent = joined.filter(is_gone).select("c.*")
        to_close = (
            joined.filter(~is_gone & ~is_new & changed_cond)
            .select("c.*")
            .withColumn("valid_to", F.lit(batch_ts).cast("timestamp"))
            .withColumn("is_current", F.lit(False))
        )
        to_insert = _with_meta(
            joined.filter(is_new | (~is_gone & changed_cond)).select("b.*"), batch_ts
        )
        out = closed.unionByName(untouched).unionByName(absent).unionByName(to_close).unionByName(
            to_insert
        )

    out.write.mode("overwrite").parquet(os.path.join(base, next_v))
    _swap_to(base, next_v)
    return read_incremental(spark, base)
