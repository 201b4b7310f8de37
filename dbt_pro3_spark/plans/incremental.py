"""Incremental materialization — the upgrade path the reference never took.

Every reference model is full-refresh `table` (dbt_project.yml:31-43): each
run rescans and rewrites everything. At 100 TB that's the difference between
a nightly job and an impossible one. This module adds dbt-style incremental
semantics on parquet:

- append           : new batch rows are appended as new files (cheapest;
                     correct for immutable event/fact data).
- merge_latest     : upsert by unique key, latest-wins by an ordering column
                     — the incremental twin of the silver layer's
                     ROW_NUMBER dedup. Implemented as union + window dedup
                     written to a new version directory, then an atomic
                     pointer swap (no reader ever sees a half-written
                     table; old versions are pruned).
- merge_delete     : merge_latest plus the hard-delete lane (Delta's
                     MERGE ... WHEN MATCHED AND s.tombstone THEN DELETE):
                     after latest-wins, keys whose WINNING record carries
                     the tombstone flag leave the table entirely. An older
                     live record never resurrects a key its newer tombstone
                     removed, and a re-insert AFTER a delete (newer
                     order_col, flag off) wins back in — CDC semantics.

At cluster scale the same API maps onto Delta/Iceberg MERGE INTO; the
version-directory scheme here is the dependency-free equivalent with the
same reader-isolation property.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_POINTER = "_CURRENT"


def _current_version(base: str) -> str | None:
    ptr = os.path.join(base, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return f.read().strip()


def _swap_to(base: str, version: str, retain: int = 1) -> None:
    """Atomically point readers at ``version``; prune superseded versions
    OLDER than the ``retain`` most recent ones.

    Retention matters for lazy readers: a DataFrame returned by a previous
    apply still reads its version directory — deleting it immediately would
    break that reader mid-plan (Delta's VACUUM-retention tradeoff, found
    the hard way). retain=1 keeps exactly the previous version alive.
    """
    ptr = os.path.join(base, _POINTER)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, ptr)  # atomic on POSIX
    versions = sorted(
        (d for d in os.listdir(base) if d.startswith("v_")),
        key=lambda d: int(d[2:]),
    )
    keep = set(versions[-(retain + 1):]) | {version}
    for d in versions:
        if d not in keep:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def read_incremental(spark: SparkSession, base: str) -> DataFrame | None:
    cur = _current_version(base)
    if cur is None:
        return None
    return spark.read.parquet(os.path.join(base, cur))


def write_incremental(
    spark: SparkSession,
    base: str,
    batch: DataFrame,
    mode: str = "merge_latest",
    unique_key: str | None = None,
    order_col: str | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Apply one incremental batch; returns the new table state.

    merge_latest: rows in ``batch`` replace existing rows with the same
    ``unique_key`` when their ``order_col`` is newer (ties broken toward the
    incoming batch, matching MERGE semantics).

    merge_delete: merge_latest, then drop keys whose winning record has
    ``delete_col`` true (MERGE WHEN MATCHED AND tombstone THEN DELETE).
    The tombstone column stays in the stored schema (always false for
    surviving rows) so later batches union cleanly.
    """
    os.makedirs(base, exist_ok=True)
    existing = read_incremental(spark, base)
    cur = _current_version(base)
    next_v = f"v_{(int(cur[2:]) + 1) if cur else 0}"

    if existing is None:
        if mode == "merge_delete":
            if not delete_col:
                raise ValueError("merge_delete requires delete_col")
            # a tombstone in the very first batch deletes on arrival too
            merged = batch.filter(~F.col(delete_col))
        else:
            merged = batch
    elif mode == "append":
        merged = existing.unionByName(batch)
    elif mode in ("merge_latest", "merge_delete"):
        if not unique_key or not order_col:
            raise ValueError(f"{mode} requires unique_key and order_col")
        if mode == "merge_delete" and not delete_col:
            raise ValueError("merge_delete requires delete_col")
        # __src=1 for incoming so equal order_col prefers the new batch
        u = existing.withColumn("__src", F.lit(0)).unionByName(
            batch.withColumn("__src", F.lit(1))
        )
        w = Window.partitionBy(unique_key).orderBy(
            F.desc(order_col), F.desc("__src")
        )
        merged = (
            u.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )
        if mode == "merge_delete":
            # tombstoned WINNERS leave the table; an older live row never
            # resurrects the key (it already lost the window above)
            merged = merged.filter(~F.col(delete_col))
    else:
        raise ValueError(f"unknown incremental mode {mode!r}")

    merged.write.mode("overwrite").parquet(os.path.join(base, next_v))
    _swap_to(base, next_v)
    return read_incremental(spark, base)


def read_version(spark: SparkSession, base: str, steps_back: int = 0) -> DataFrame | None:
    """Time travel on the version store: steps_back=0 is the current
    pointer, 1 is the previous retained version (the Delta/Iceberg
    `VERSION AS OF` read). Returns None past the retention horizon —
    _swap_to prunes versions older than its ``retain`` window, exactly
    like VACUUM limits time travel."""
    cur = _current_version(base)
    if cur is None:
        return None
    versions = sorted(
        (d for d in os.listdir(base) if d.startswith("v_")),
        key=lambda d: int(d[2:]),
    )
    idx = versions.index(cur) - steps_back
    if idx < 0:
        return None
    return spark.read.parquet(os.path.join(base, versions[idx]))
