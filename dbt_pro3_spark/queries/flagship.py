"""Flagship query: the executive-summary shape.

Mirrors the reference's deepest gold mart (gold_executive_summary.sql:21-146):
two monthly rollups -> FULL OUTER JOIN month alignment -> COALESCE defaults ->
zero-guarded ratio -> LAG(12) YoY growth -> ORDER BY month DESC. On the
driver's testdata the roles are orders≈policies, lineitem≈claims (FIXTURES.md
mapping).

Scale notes: both rollups partial-aggregate map-side before their shuffle;
the full-outer join keys on the (low-cardinality, post-agg) month, so the
single-partition global LAG window is safe — rows == months (SURVEY §7
hazard 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import month_bucket, safe_div
from ..sources.readers import load
from . import dround, register

_ORACLE = f"""
WITH om AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS report_month,
           COUNT(DISTINCT o_custkey) AS active_customers,
           COUNT(*) AS order_count,
           {dround('SUM(o_totalprice)', 2)} AS total_order_value
    FROM orders GROUP BY 1
), lm AS (
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS report_month,
           COUNT(*) AS lineitem_count,
           {dround('SUM(l_extendedprice * (1 - l_discount))', 2)} AS total_revenue
    FROM lineitem GROUP BY 1
), joined AS (
    SELECT COALESCE(om.report_month, lm.report_month) AS report_month,
           COALESCE(active_customers, 0) AS active_customers,
           COALESCE(order_count, 0) AS order_count,
           COALESCE(total_order_value, 0.0) AS total_order_value,
           COALESCE(lineitem_count, 0) AS lineitem_count,
           COALESCE(total_revenue, 0.0) AS total_revenue
    FROM om FULL OUTER JOIN lm ON om.report_month = lm.report_month
), enriched AS (
    SELECT *,
           {dround('total_revenue / NULLIF(CAST(total_order_value AS DOUBLE), 0)', 6)} AS revenue_ratio,
           LAG(total_revenue, 12) OVER (ORDER BY report_month) AS prev_year_revenue
    FROM joined
)
SELECT report_month, active_customers, order_count, total_order_value,
       lineitem_count, total_revenue, revenue_ratio, prev_year_revenue,
       CASE WHEN prev_year_revenue > 0
            THEN {dround('(total_revenue - prev_year_revenue) / prev_year_revenue * 100', 4)}
       END AS yoy_growth_pct
FROM enriched
ORDER BY report_month DESC
"""


def exec_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    om = orders.groupBy(month_bucket(F.col("o_orderdate")).alias("report_month")).agg(
        F.countDistinct("o_custkey").alias("active_customers"),
        F.count(F.lit(1)).alias("order_count"),
        F.round(F.sum("o_totalprice"), 2).alias("total_order_value"),
    )
    lm = lineitem.groupBy(month_bucket(F.col("l_shipdate")).alias("report_month")).agg(
        F.count(F.lit(1)).alias("lineitem_count"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        ),
    )

    # string-key full outer join auto-coalesces the two key columns,
    # matching the reference's COALESCE(a.key, b.key) merge (SURVEY §7 h.5)
    joined = om.join(lm, "report_month", "full").select(
        "report_month",
        F.coalesce("active_customers", F.lit(0)).alias("active_customers"),
        F.coalesce("order_count", F.lit(0)).alias("order_count"),
        F.coalesce("total_order_value", F.lit(0.0)).alias("total_order_value"),
        F.coalesce("lineitem_count", F.lit(0)).alias("lineitem_count"),
        F.coalesce("total_revenue", F.lit(0.0)).alias("total_revenue"),
    )

    # global (unpartitioned) LAG — safe here only because input is one row
    # per month post-aggregation (SURVEY §7 hazard 6)
    w = Window.orderBy("report_month")
    out = (
        joined.withColumn(
            "revenue_ratio", safe_div(F.col("total_revenue"), F.col("total_order_value"), 6)
        )
        .withColumn("prev_year_revenue", F.lag("total_revenue", 12).over(w))
        .withColumn(
            "yoy_growth_pct",
            F.when(
                F.col("prev_year_revenue") > 0,
                F.round(
                    (F.col("total_revenue") - F.col("prev_year_revenue"))
                    / F.col("prev_year_revenue")
                    * 100,
                    4,
                ),
            ),
        )
    )
    return out.orderBy(F.desc("report_month"))


register("flagship_exec_summary", _ORACLE)(exec_summary)
