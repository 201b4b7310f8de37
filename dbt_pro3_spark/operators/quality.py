"""Data-quality operators: flag columns + the dbt-style schema tests.

- ``dq_flags``      : attach 0/1 quality-flag columns (silver layer pattern,
                      customers_silver.sql:49-53).
- ``test_not_null`` : dbt ``not_null`` (bronze_schema.yml:10 et al).
- ``test_unique``   : dbt ``unique``  (bronze_schema.yml:11 et al) — compiled
                      exactly as dbt does: GROUP BY pk HAVING count(*) > 1.

Tests return violation-count DataFrames rather than booleans so they stay
lazy/distributed; the runner asserts count == 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_flags(df: DataFrame, flags: dict[str, Column]) -> DataFrame:
    """Attach 0/1 INT flag columns computed from predicates."""
    for name, cond in flags.items():
        df = df.withColumn(name, F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("int"))
    return df


def test_not_null(df: DataFrame, column: str) -> DataFrame:
    """One row: (column_name, violations) — count of NULLs in ``column``."""
    return df.filter(F.col(column).isNull()).agg(
        F.lit(column).alias("column_name"),
        F.count(F.lit(1)).alias("violations"),
    )


def test_unique(df: DataFrame, column: str) -> DataFrame:
    """One row: (column_name, violations) — count of duplicated key values.

    dbt compiles unique tests to GROUP BY key HAVING count(*) > 1 (SURVEY §3
    entry point 2); this is that plan, with a map-side partial count before
    the shuffle courtesy of hash aggregation.
    """
    dupes = (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return dupes.agg(
        F.lit(column).alias("column_name"),
        F.count(F.lit(1)).alias("violations"),
    )


def test_accepted_values(df: DataFrame, column: str, values: list[str]) -> DataFrame:
    """One row: (column_name, violations) — count of rows whose value is
    outside the accepted set. dbt ``accepted_values`` (not used by the
    reference's schema files, which stop at not_null/unique — this
    completes the standard dbt test quartet). NULLs are not violations,
    matching dbt's compiled SQL (NOT IN is null-rejecting there too)."""
    return df.filter(
        F.col(column).isNotNull() & ~F.col(column).isin(values)
    ).agg(
        F.lit(column).alias("column_name"),
        F.count(F.lit(1)).alias("violations"),
    )


def test_relationships(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """One row: (column_name, violations) — count of child rows whose FK
    has no parent (dbt ``relationships``). Compiled to a LEFT ANTI join:
    only keys travel, the parent side reduces to a distinct-key
    projection, and Catalyst broadcasts it when small."""
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias("__pk")).distinct(),
        F.col(child_key) == F.col("__pk"),
        "left_anti",
    )
    return orphans.agg(
        F.lit(child_key).alias("column_name"),
        F.count(F.lit(1)).alias("violations"),
    )
