"""SURVEY.md §2.D (joins), §2.E (aggregations), §2.F (windows),
§2.G (sorts), §2.I (CTE/dedup/quality composites), §2.J (test/audit
operators) — one registered query per operator key with DuckDB oracle twins.

Scale notes inline per query; the common ones:
- small dimension sides get an explicit broadcast() hint (customer/nation are
  classic broadcast dims; at 100 TB the fact side never shuffles for these);
- aggregations pre-reduce BEFORE joins where the reference does
  (pre-aggregation is semantics there, SURVEY §4);
- dedup windows partition by high-cardinality keys (shuffle scales out);
  LAG windows partition by series key; the only global window is
  post-aggregation (rows == months).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import cond_count, cond_sum, month_bucket
from ..operators.quality import dq_flags, test_not_null, test_unique
from ..operators.windows import dedup_latest
from ..sources.readers import load
from ..sources.sinks import audit_row
from . import dround, register


# --------------------------------------------------------------- 2.D joins

@register(
    "join_inner_equi",
    f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_items,
           {dround('SUM(l_extendedprice * (1 - l_discount))', 2)} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK equi-join then aggregate (claims ⋈ policies,
    gold_policy_performance.sql:52). Catalyst/AQE picks broadcast vs
    sort-merge; both sides are fact-sized so SMJ at scale is correct."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_three_way_chain",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_items,
           {dround('SUM(l_extendedprice * (1 - l_discount))', 2)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_three_way_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop join chain claims⋈policies⋈customers
    (gold_claims_operations.sql:39-41). The customer dimension is explicitly
    broadcast — at 100 TB the lineitem/orders shuffle keys on orderkey only,
    and the dim join costs no extra shuffle."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_left_enrich",
    """
    WITH agg AS (
        SELECT o_custkey, COUNT(*) AS cnt, MAX(o_orderdate) AS last_dt
        FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey,
           COALESCE(cnt, 0) AS n_orders,
           last_dt AS last_order_date
    FROM customer LEFT JOIN agg ON c_custkey = o_custkey
    """,
)
def join_left_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base LEFT JOIN pre-aggregated metrics, preserving all base rows
    (gold_customer_360.sql:148-149). Aggregating BEFORE the join is the
    reference's own structure — and at scale avoids the join-then-agg row
    blowup (SURVEY §4)."""
    c = load(spark, sf_dir, "customer")
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("o_orderdate").alias("last_dt"))
    )
    return c.join(agg, c.c_custkey == agg.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("cnt", F.lit(0)).alias("n_orders"),
        F.col("last_dt").alias("last_order_date"),
    )


@register(
    "join_left_two_key",
    """
    WITH base AS (
        SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1, 2
    ), finished AS (
        SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
               COUNT(*) AS n_finished
        FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2
    )
    SELECT base.o_orderpriority, base.order_month, n_orders,
           COALESCE(n_finished, 0) AS n_finished
    FROM base LEFT JOIN finished
      ON base.o_orderpriority = finished.o_orderpriority
     AND base.order_month = finished.order_month
    """,
)
def join_left_two_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN on a compound key (policy_type AND month,
    gold_policy_performance.sql:124-126). Both sides shuffle on the same
    two-column key, so the join co-partitions with no extra exchange."""
    o = load(spark, sf_dir, "orders")
    base = o.groupBy(
        "o_orderpriority", month_bucket(F.col("o_orderdate")).alias("order_month")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    fin = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority", month_bucket(F.col("o_orderdate")).alias("order_month"))
        .agg(F.count(F.lit(1)).alias("n_finished"))
    )
    return base.join(fin, ["o_orderpriority", "order_month"], "left").select(
        "o_orderpriority",
        "order_month",
        "n_orders",
        F.coalesce("n_finished", F.lit(0)).alias("n_finished"),
    )


@register(
    "join_full_outer",
    """
    WITH om AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS report_month, COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    ), lm AS (
        SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS report_month, COUNT(*) AS n_shipments
        FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(om.report_month, lm.report_month) AS report_month,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_shipments, 0) AS n_shipments
    FROM om FULL OUTER JOIN lm ON om.report_month = lm.report_month
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER month-series alignment with COALESCEd merged key
    (gold_executive_summary.sql:88,49). The string-key join form makes Spark
    emit the coalesced key automatically (SURVEY §7 hazard 5)."""
    om = (
        load(spark, sf_dir, "orders")
        .groupBy(month_bucket(F.col("o_orderdate")).alias("report_month"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    lm = (
        load(spark, sf_dir, "lineitem")
        .groupBy(month_bucket(F.col("l_shipdate")).alias("report_month"))
        .agg(F.count(F.lit(1)).alias("n_shipments"))
    )
    return om.join(lm, "report_month", "full").select(
        "report_month",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_shipments", F.lit(0)).alias("n_shipments"),
    )


@register(
    "join_cross_scalar",
    """
    SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
           (SELECT COUNT(*) FROM lineitem) AS n_lineitems
    """,
)
def join_cross_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit cross join of two 1-row scalar COUNT(*) subqueries — the
    audit post-hook shape (customers_bronze.sql:15-17). A 1×1 cross join is
    trivially broadcast; never use crossJoin on non-scalar inputs."""
    n_o = load(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("n_orders"))
    n_l = load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_lineitems"))
    return n_o.crossJoin(n_l)


# -------------------------------------------------------- 2.E aggregations

@register(
    "agg_groupby_multikey",
    f"""
    SELECT l_returnflag, l_linestatus, o_orderstatus, o_orderpriority,
           CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           CASE WHEN l_quantity >= 30 THEN 'HIGH'
                WHEN l_quantity >= 10 THEN 'MID'
                ELSE 'LOW' END AS qty_bucket,
           CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS deep_discount,
           l_suppkey % 10 AS supp_bucket,
           COUNT(*) AS n_items,
           {dround('SUM(l_extendedprice)', 2)} AS gross_revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2, 3, 4, 5, 6, 7, 8
    """,
)
def agg_groupby_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-key GROUP BY including computed expressions
    (gold_claims_operations.sql:43-44). Hash aggregate with map-side partial
    aggregation; high combined-key cardinality is fine — it shuffles once."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    qty_bucket = (
        F.when(F.col("l_quantity") >= 30, "HIGH")
        .when(F.col("l_quantity") >= 10, "MID")
        .otherwise("LOW")
    )
    deep = F.when(F.col("l_discount") > 0.05, F.lit(1)).otherwise(F.lit(0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_returnflag",
            "l_linestatus",
            "o_orderstatus",
            "o_orderpriority",
            month_bucket(F.col("l_shipdate")).alias("ship_month"),
            qty_bucket.alias("qty_bucket"),
            deep.alias("deep_discount"),
            (F.col("l_suppkey") % 10).alias("supp_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross_revenue"),
        )
    )


@register(
    "agg_count_star",
    "SELECT l_returnflag, COUNT(*) AS n_rows FROM lineitem GROUP BY l_returnflag",
)
def agg_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) per group (gold_policy_performance.sql:27)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "agg_count_distinct",
    """
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT ...) (gold_customer_360.sql:39,57) — exact, not
    approx_count_distinct, because the oracle hash must match (SURVEY §2.E).
    Spark expands this to a two-phase aggregate automatically."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


@register(
    "agg_sum_avg_min_max",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dround('SUM(l_quantity)', 2)} AS sum_qty,
           {dround('SUM(l_extendedprice)', 2)} AS sum_base_price,
           {dround('AVG(l_quantity)', 6)} AS avg_qty,
           {dround('AVG(l_extendedprice)', 6)} AS avg_price,
           MIN(l_shipdate) AS min_shipdate,
           MAX(l_shipdate) AS max_shipdate,
           COUNT(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_sum_avg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM/AVG/MIN/MAX battery (gold_customer_360.sql:40-45) — the TPC-H Q1
    shape on the testdata tables."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.min("l_shipdate").alias("min_shipdate"),
            F.max("l_shipdate").alias("max_shipdate"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_conditional_count",
    """
    SELECT c_mktsegment,
           COUNT(CASE WHEN c_acctbal > 5000 THEN 1 END) AS n_wealthy,
           COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS n_negative
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_conditional_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(CASE WHEN cond THEN 1 END) — NULL else-branch means unmatched
    rows are NOT counted (gold_customer_360.sql:46-47; SURVEY §7 hazard 4:
    F.count(F.when(...)), never sum-with-default)."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            cond_count(F.col("c_acctbal") > 5000).alias("n_wealthy"),
            cond_count(F.col("c_acctbal") < 0).alias("n_negative"),
        )
    )


@register(
    "agg_conditional_sum",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_deep_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(CASE WHEN cond THEN 1 ELSE 0 END)
    (gold_claims_operations.sql:53 fraud counter)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(cond_sum(F.col("l_discount") > 0.05).alias("n_deep_discount"))
    )


@register(
    "agg_scalar_count",
    "SELECT COUNT(*) AS n_rows FROM lineitem",
)
def agg_scalar_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table scalar COUNT(*) (audit hooks,
    customers_bronze.sql:16-17)."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


# ------------------------------------------------------------ 2.F windows

@register(
    "win_row_number_dedup",
    """
    SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) t WHERE rn = 1
    """,
)
def win_row_number_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER latest-wins dedup (customers_silver.sql:58-64): keep each
    user's most recent event. event_id DESC tiebreak keeps the ordering
    deterministic (SURVEY §7 hazard 1). Partitioned by a high-cardinality
    key, so the window shuffle scales out."""
    ev = load(spark, sf_dir, "events")
    return dedup_latest(ev, keys=["user_id"], order_desc=["ts", "event_id"]).select(
        "user_id", "event_id", "event_type", "value"
    )


@register(
    "win_lag_1_partitioned",
    """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS event_day,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, event_day, n_events,
           LAG(n_events, 1) OVER (PARTITION BY event_type ORDER BY event_day) AS prev_n_events,
           n_events - LAG(n_events, 1) OVER (PARTITION BY event_type ORDER BY event_day) AS dod_change
    FROM daily
    """,
)
def win_lag_1_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG(x, 1) period-over-period trend per series
    (gold_claims_operations.sql:114-122), on the daily event series."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("event_day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("event_day")
    return daily.select(
        "event_type",
        "event_day",
        "n_events",
        F.lag("n_events", 1).over(w).alias("prev_n_events"),
        (F.col("n_events") - F.lag("n_events", 1).over(w)).alias("dod_change"),
    )


@register(
    "win_lag_12_partitioned",
    f"""
    WITH monthly AS (
        SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
               {dround('SUM(o_totalprice)', 2)} AS monthly_value
        FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, order_month, monthly_value,
           LAG(monthly_value, 12) OVER (PARTITION BY o_orderpriority ORDER BY order_month) AS prev_year_value
    FROM monthly
    """,
)
def win_lag_12_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG(x, 12) YoY per series (gold_policy_performance.sql:110-118)."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority", month_bucket(F.col("o_orderdate")).alias("order_month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("monthly_value"))
    w = Window.partitionBy("o_orderpriority").orderBy("order_month")
    return monthly.select(
        "o_orderpriority",
        "order_month",
        "monthly_value",
        F.lag("monthly_value", 12).over(w).alias("prev_year_value"),
    )


@register(
    "win_lag_12_global",
    f"""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
               {dround('SUM(o_totalprice)', 2)} AS monthly_value
        FROM orders GROUP BY 1
    )
    SELECT order_month, monthly_value,
           LAG(monthly_value, 12) OVER (ORDER BY order_month) AS prev_year_value,
           CASE WHEN LAG(monthly_value, 12) OVER (ORDER BY order_month) > 0
                THEN {dround('(monthly_value - LAG(monthly_value, 12) OVER (ORDER BY order_month)) '
                             '/ LAG(monthly_value, 12) OVER (ORDER BY order_month) * 100', 4)}
           END AS yoy_growth_pct
    FROM monthly
    """,
)
def win_lag_12_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpartitioned global LAG(12) + growth arithmetic
    (gold_executive_summary.sql:114-131). Single-partition window — safe ONLY
    because the input is post-aggregation, one row per month (SURVEY §7
    hazard 6); never use this shape pre-aggregation at scale."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(month_bucket(F.col("o_orderdate")).alias("order_month")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("monthly_value")
    )
    w = Window.orderBy("order_month")
    prev = F.lag("monthly_value", 12).over(w)
    return monthly.select(
        "order_month",
        "monthly_value",
        prev.alias("prev_year_value"),
        F.when(
            prev > 0,
            F.round((F.col("monthly_value") - prev) / prev * 100, 4),
        ).alias("yoy_growth_pct"),
    )


# ------------------------------------------------------- 2.G sorts/limits

@register(
    "sort_global_desc",
    f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           COUNT(*) AS n_orders,
           {dround('SUM(o_totalprice)', 2)} AS monthly_value
    FROM orders GROUP BY 1
    ORDER BY order_month DESC
    """,
)
def sort_global_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final presentation ORDER BY ... DESC (gold_executive_summary.sql:146).
    A global sort is a range-partitioned exchange — acceptable only on
    post-aggregation row counts, exactly as the reference uses it."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(month_bucket(F.col("o_orderdate")).alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("monthly_value"),
        )
        .orderBy(F.desc("order_month"))
    )


# ------------------------------------- 2.I CTE composition / dedup quality

@register(
    "cte_pipeline",
    """
    WITH cleaned AS (
        SELECT event_id, user_id, UPPER(TRIM(event_type)) AS event_type, ts, value, props
        FROM events
    ), flagged AS (
        SELECT *,
               CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END AS missing_props_flag,
               CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END AS invalid_value_flag
        FROM cleaned
    ), deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM flagged WHERE missing_props_flag = 0
        ) t WHERE rn = 1
    )
    SELECT event_id, user_id, event_type, value,
           missing_props_flag, invalid_value_flag,
           CASE WHEN value >= 500 THEN 'HIGH' WHEN value >= 100 THEN 'MID' ELSE 'LOW' END AS value_bucket
    FROM deduped
    """,
)
def cte_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stage CTE pipeline clean → flag → dedup → derive
    (customers_silver.sql:21-91). Intermediate DataFrames are the CTEs;
    Catalyst inlines them — no materialization between stages."""
    ev = load(spark, sf_dir, "events")
    cleaned = ev.select(
        "event_id",
        "user_id",
        F.upper(F.trim(F.col("event_type"))).alias("event_type"),
        "ts",
        "value",
        "props",
    )
    flagged = dq_flags(
        cleaned,
        {
            "missing_props_flag": F.col("props").isNull() | (F.col("props") == ""),
            "invalid_value_flag": F.col("value").isNull() | (F.col("value") < 0),
        },
    )
    # filter bad keys BEFORE the dedup window — predicates don't push
    # through window functions (SURVEY §4 manual-pushdown note)
    deduped = dedup_latest(
        flagged.filter(F.col("missing_props_flag") == 0),
        keys=["user_id", "event_type"],
        order_desc=["ts", "event_id"],
    )
    return deduped.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "missing_props_flag",
        "invalid_value_flag",
        F.when(F.col("value") >= 500, "HIGH")
        .when(F.col("value") >= 100, "MID")
        .otherwise("LOW")
        .alias("value_bucket"),
    )


@register(
    "dq_flag_columns",
    r"""
    SELECT c_custkey,
           CASE WHEN c_name IS NULL OR c_name = '' THEN 1 ELSE 0 END AS missing_name_flag,
           CASE WHEN NOT regexp_matches(c_name, '^Customer#[0-9]+$') THEN 1 ELSE 0 END AS invalid_name_flag,
           CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS negative_balance_flag
    FROM customer
    """,
)
def dq_flag_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0/1 quality-flag column battery carried to output for downstream
    filtering (customers_silver.sql:49-53)."""
    c = load(spark, sf_dir, "customer")
    return dq_flags(
        c.select("c_custkey", "c_name", "c_acctbal"),
        {
            "missing_name_flag": F.col("c_name").isNull() | (F.col("c_name") == ""),
            "invalid_name_flag": ~F.col("c_name").rlike(r"^Customer#[0-9]+$"),
            "negative_balance_flag": F.col("c_acctbal") < 0,
        },
    ).select("c_custkey", "missing_name_flag", "invalid_name_flag", "negative_balance_flag")


@register(
    "dq_filter_then_window",
    """
    SELECT user_id, event_id, ts FROM (
        SELECT user_id, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE value IS NOT NULL AND event_type <> 'error'
    ) t WHERE rn = 1
    """,
)
def dq_filter_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter bad rows BEFORE the dedup window — the reference's manual
    predicate placement (customers_silver.sql:64); Catalyst cannot push a
    filter through ROW_NUMBER, so operator order is semantics AND perf."""
    ev = load(spark, sf_dir, "events")
    good = ev.filter(F.col("value").isNotNull() & (F.col("event_type") != "error"))
    return dedup_latest(good, keys=["user_id"], order_desc=["ts", "event_id"]).select(
        "user_id", "event_id", "ts"
    )


@register(
    "derive_business_cols",
    f"""
    SELECT l_orderkey, l_linenumber,
           {dround('l_extendedprice * (1 - l_discount)', 2)} AS gross_revenue,
           {dround('l_extendedprice * l_discount', 2)} AS discount_amount,
           {dround('l_extendedprice * (1 - l_discount) * l_tax', 2)} AS tax_amount,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_returned
    FROM lineitem
    """,
)
def derive_business_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived business columns battery (claims_silver.sql:80-82 —
    reporting_delay/claim_difference/settlement_ratio analogues)."""
    li = load(spark, sf_dir, "lineitem")
    gross = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(gross, 2).alias("gross_revenue"),
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 2).alias("discount_amount"),
        F.round(gross * F.col("l_tax"), 2).alias("tax_amount"),
        F.year("l_shipdate").alias("ship_year"),
        F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0)).alias("is_returned"),
    )


# ---------------------------------------------------- 2.J tests and audits

@register(
    "test_not_null",
    """
    SELECT 'o_custkey' AS column_name, COUNT(*) AS violations
    FROM orders WHERE o_custkey IS NULL
    """,
)
def q_test_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt not_null test compiled to a violation count
    (bronze_schema.yml:10)."""
    return test_not_null(load(spark, sf_dir, "orders"), "o_custkey")


@register(
    "test_unique",
    """
    SELECT 'l_orderkey' AS column_name, COUNT(*) AS violations FROM (
        SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL
        GROUP BY l_orderkey HAVING COUNT(*) > 1
    ) t
    """,
)
def q_test_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt unique test — GROUP BY pk HAVING count(*) > 1
    (bronze_schema.yml:11; SURVEY §3 entry point 2). Run against lineitem's
    l_orderkey, which is deliberately non-unique, so the count is nonzero
    and the comparison is non-trivial."""
    return test_unique(load(spark, sf_dir, "lineitem"), "l_orderkey")


@register(
    "audit_rowcount_log",
    """
    SELECT 'lineitem' AS dataset, 'silver' AS layer,
           (SELECT COUNT(*) FROM lineitem) AS source_records,
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity > 0) AS target_records,
           CAST(0 AS BIGINT) AS bad_records
    """,
)
def q_audit_rowcount_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-hook audit record: source vs target row counts after a filtering
    transformation (claims_silver.sql:3-16 — the {{ ref }}/{{ this }}
    variant). time_processed excluded: nondeterministic (SURVEY §7 h.1)."""
    li = load(spark, sf_dir, "lineitem")
    return audit_row(
        spark, li, li.filter(F.col("l_quantity") > 0), dataset="lineitem", layer="silver"
    )


@register(
    "test_accepted_values",
    """
    SELECT 'event_type' AS column_name, COUNT(*) AS violations
    FROM events
    WHERE event_type IS NOT NULL
      AND event_type NOT IN ('view', 'click', 'purchase', 'signup')
    """,
)
def q_test_accepted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt accepted_values test: 'error' events are outside the declared
    domain of the fact feed, so the violation count is non-zero — the
    test demonstrably catches out-of-domain values."""
    from ..operators.quality import test_accepted_values

    return test_accepted_values(
        load(spark, sf_dir, "events"), "event_type", ["view", "click", "purchase", "signup"]
    )


@register(
    "test_relationships",
    """
    SELECT 'o_custkey' AS column_name, COUNT(*) AS violations
    FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
    """,
)
def q_test_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt relationships (FK-integrity) test compiled to a LEFT ANTI join
    on distinct parent keys; zero violations on this data — the referential
    cleanliness is the asserted fact."""
    from ..operators.quality import test_relationships

    return test_relationships(
        load(spark, sf_dir, "orders"), "o_custkey",
        load(spark, sf_dir, "customer"), "c_custkey",
    )
