"""SparkSession factory tuned for the engine.

Scale posture: these settings are chosen so the same logical plans that pass
correctness at sf0.01 remain the plans you'd want on a 1000-executor cluster
at 100 TB — AQE for runtime re-planning (coalescing post-shuffle partitions,
skew-join splitting), generous broadcast threshold for dim tables, Arrow for
any pandas-exchange path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "dbt-pro3-spark") -> SparkSession:
    """Create (or get) the tuned local SparkSession.

    local[N] in tests / bench; on a real cluster the same confs apply
    (master comes from spark-submit instead).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    shuffle = os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(int(cpus), 8)))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        # Long sessions that run MANY short queries (the bench runs 339 keys
        # x 3 passes in one session; a production engine behaves the same)
        # accumulate dead persisted blocks: localCheckpoint()/persist()
        # blocks are only freed by the ContextCleaner when a JVM GC collects
        # the RDD reference, and the cleaner's own periodic System.gc()
        #
        # Cluster caveat (ADVICE r10): the query functions' reuse pins are
        # localCheckpoint(eager=False) — lineage-truncating, unreplicated
        # blocks. On local[N] (this engine's deployment) executor loss is
        # process death, so nothing is lost; on a multi-executor cluster
        # with dynamic allocation, losing an executor mid-query makes a
        # pinned frame unrecoverable (the query fails and must be re-run
        # rather than recomputing the lost partitions from lineage). If
        # this engine is ever deployed multi-executor, swap the pins to
        # reliable checkpoint() on HDFS-class storage or accept re-run
        # semantics; the pin SITES are all grep-able as localCheckpoint.
        # defaults to 30min — longer than a whole bench pass. Measured here
        # (r10): repeated runs of checkpoint-heavy keys degrade within a
        # session (ext_graph_kcore 5.6 -> 11.5 s over 6 runs) while the
        # first run of a fresh session is fast. A 1-minute periodic GC keeps
        # the block manager near steady state. Parameterised: on a real
        # cluster with a bigger driver heap, tune via SPARK_GRAFT_PERIODIC_GC.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "1min"),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs defensively.

    The driver hands us ITS SparkSession; semantics-critical confs
    (UTC timezone so date_trunc/year agree with the DuckDB oracle on the
    shared parquet instants, AQE on) are (re)applied here because they are
    runtime-mutable.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # events.parquet stores INT64 TIMESTAMP(NANOS) which the vectorized
    # reader rejects; read as long and convert in the loader instead.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # testdata micros timestamps carry isAdjustedToUTC=false; without this,
    # Spark 4 reads them as TIMESTAMP_NTZ, which breaks unix_micros/double
    # casts and (if fixed by post-scan casts) would defeat parquet filter
    # pushdown on l_shipdate/o_orderdate/ts. Reading them as session-UTC
    # TIMESTAMP keeps round-1 semantics AND pushdown.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark
