"""Sinks: table materialization + audit logging.

Reference semantics (SURVEY.md §2.A / §3):
- every model is materialized full-refresh as a table
  (dbt_project.yml:31-43 ``+materialized: table``);
- every model run post-hook appends one audit row of source/target counts to
  a logging table (models/bronze/customers_bronze.sql:4-19, schema at :6-7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def materialize_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """CTAS-equivalent: overwrite-materialize a model as parquet.

    ``partition_by`` (e.g. a month column for gold marts) enables partition
    pruning for downstream readers at scale.
    """
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def audit_row(
    spark: SparkSession,
    source_df: DataFrame,
    target_df: DataFrame,
    dataset: str,
    layer: str,
) -> DataFrame:
    """Build the one-row audit record a post-hook appends.

    Reproduces the implicit cross join of two scalar COUNT(*) subqueries
    (customers_bronze.sql:15-17). ``bad_records`` is hard-coded 0 exactly as
    in the reference (:14). The ``time_processed`` stamp is intentionally NOT
    included here (nondeterministic — SURVEY §7 hazard 1); the runner adds it
    at append time.
    """
    src = source_df.agg(F.count(F.lit(1)).alias("source_records"))
    tgt = target_df.agg(F.count(F.lit(1)).alias("target_records"))
    return (
        src.crossJoin(tgt)
        .select(
            F.lit(dataset).alias("dataset"),
            F.lit(layer).alias("layer"),
            F.col("source_records"),
            F.col("target_records"),
            F.lit(0).cast("bigint").alias("bad_records"),
        )
    )
