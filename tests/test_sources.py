"""Source-reader contracts.

The driver regenerates testdata between rounds and has already shipped two
physical timestamp encodings (nanos-as-INT64, micros isAdjustedToUTC=false).
These tests pin the loader contract: whatever the parquet encoding, every
table column arrives as plain session-UTC TIMESTAMP — never TIMESTAMP_NTZ
(breaks unix_micros/double casts/watermarks) and never a raw bigint.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_pro3_spark.sources.readers import TESTDATA_TABLES, load, normalize_ts

from .conftest import SF_DIR


def test_no_ntz_or_raw_ts_survives_load(spark):
    for name in TESTDATA_TABLES:
        df = load(spark, SF_DIR, name)
        for col, dtype in df.dtypes:
            assert dtype != "timestamp_ntz", f"{name}.{col} leaked TIMESTAMP_NTZ"
            if col == "ts":
                assert dtype == "timestamp", f"{name}.ts is {dtype}, want timestamp"


def test_normalize_ts_casts_ntz(spark):
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-05 10:30:00' AS ts, 1 AS x"
    )
    out = normalize_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    # session tz is UTC -> the wall-clock value is preserved
    row = out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s")).first()
    assert row["s"] == "2024-01-05 10:30:00"


def test_normalize_ts_converts_nanos_long(spark):
    # 2024-01-05 10:30:00 UTC in nanoseconds since epoch
    ns = 1_704_450_600_000_000_000
    df = spark.range(1).select(F.lit(ns).alias("ts"))
    out = normalize_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    row = out.select(F.unix_micros("ts").alias("us")).first()
    assert row["us"] == ns // 1000


def test_timestamp_filter_pushdown_reaches_scan(spark):
    """The NTZ fix must keep working AT THE SCAN: a timestamp predicate on
    l_shipdate has to appear in PushedFilters, not as a post-scan cast
    filter (the difference is a full-table read at 100 TB)."""
    li = (
        load(spark, SF_DIR, "lineitem")
        .filter(F.col("l_shipdate") >= "1996-09-01")
        .select("l_orderkey")
    )
    plan = li._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
