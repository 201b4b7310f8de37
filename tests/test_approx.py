"""Approximate aggregates: the documented 100 TB swaps for the exact
operators the oracle demands (SCALE.md §3). Verified against exact within
their advertised error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_pro3_spark.sources.readers import load

from .conftest import SF_DIR


def test_approx_count_distinct_within_bound(spark):
    o = load(spark, SF_DIR, "orders")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05, (exact, approx)


def test_approx_percentile_within_bound(spark):
    li = load(spark, SF_DIR, "lineitem")
    exact = li.select(F.percentile("l_extendedprice", F.lit(0.5))).collect()[0][0]
    approx = li.select(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.01, (exact, approx)
