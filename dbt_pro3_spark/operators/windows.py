"""Window operators: latest-wins dedup + LAG trend windows.

Scale notes (SURVEY.md §4): dedup windows partition by high-cardinality
primary keys, so they shuffle-scale linearly. An UNPARTITIONED window
(``lag_over`` with partition_by=[]) collapses to one partition — safe only
post-aggregation where rows == months (gold_executive_summary.sql:114), and
asserted as such by callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(df: DataFrame, keys: list[str], order_desc: list[str]) -> DataFrame:
    """ROW_NUMBER latest-wins dedup (customers_silver.sql:58-64).

    Keeps the first row per ``keys`` under descending ``order_desc``
    (e.g. updated_at DESC, processed_at DESC). Callers must make the ordering
    tie-free (SURVEY §7 hazard 1) — pass a unique column last.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_desc])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lag_over(
    df: DataFrame,
    col: str,
    offset: int,
    partition_by: list[str],
    order_by: str,
    alias: str,
) -> DataFrame:
    """LAG(col, offset) OVER (PARTITION BY ... ORDER BY ...) trend column
    (gold_claims_operations.sql:114-122, gold_policy_performance.sql:110-118,
    gold_executive_summary.sql:114-131 for the global variant)."""
    w = Window.partitionBy(*partition_by).orderBy(order_by) if partition_by else Window.orderBy(order_by)
    return df.withColumn(alias, F.lag(col, offset).over(w))
