"""Scale utilities: the knobs a 100 TB deployment turns.

- ``salted_join``       : skew mitigation for hot join keys — salt the big
                          (skewed) side into S sub-keys and replicate the
                          small side S times, so one hot key spreads over S
                          tasks instead of stalling one. AQE's skew-join
                          split handles sort-merge skew automatically; this
                          is the explicit form for when the small side is
                          joinable but not broadcastable.
- ``write_bucketed``    : bucketBy on the join key — repeated co-located
                          joins/aggregations on that key read shuffle-free.
- ``write_partitioned`` : partitionBy a low-cardinality column (e.g. month)
                          so readers with a partition predicate scan only
                          matching directories (partition pruning).

Each has a plan-level proof in tests/test_scale.py — not just "returns the
right rows" but "the Exchange/scan shape is the one you'd want".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with key salting.

    big side: deterministic salt from a high-entropy row attribute via
    pmod(xxhash64(all columns), S) — spreads a hot key's rows across S
    partitions. small side: exploded S times (one row per salt value).
    Result == plain ``big.join(small, key, how)`` with the salt columns
    dropped; the equality is oracle-checked in the query registry.

    Only ``inner`` and ``left`` (outer from the big side) are equivalent
    under salting: replicating the small side S times would surface
    unmatched small rows S times in right/full joins, and left_semi /
    left_anti change semantics too, so those are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got {how!r}): "
            "replicating the small side breaks right/full/semi/anti joins"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_salted = big.withColumn("__salt", salt.cast("int"))
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_salted.join(small_salted, [key, "__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Materialize as a bucketed (and optionally sorted) managed table.

    Subsequent joins/aggs keyed on ``bucket_col`` between tables bucketed
    the same way run WITHOUT a shuffle — the payoff for every repeated
    pipeline run against the same keys.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Materialize partitioned by low-cardinality columns for pruning."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
