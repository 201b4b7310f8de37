"""Correlated-subquery query shapes (TPC-H Q4/Q11/Q21/Q22 skeletons).

The reference has no subqueries at all (SURVEY.md §2.D: equi-joins only;
§2.H: no set ops) — these keys extend coverage to the decorrelation
patterns every SQL engine must handle: EXISTS -> left-semi join,
NOT EXISTS -> left-anti join, scalar subquery -> broadcast 1-row join.
Spark-first discipline: the scalar aggregates stay distributed (a 1-row
DataFrame cross-joined in, which Catalyst broadcasts) — never a
driver-side .collect() round trip.

Float discipline: every comparison against a computed double threshold is
made on values ROUNDED identically on both engines, so IEEE
summation-order noise cannot flip a row across the boundary
(see queries/__init__ docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load
from . import dround, register


@register(
    "q_late_shipment_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 45 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality on the
    correlated column, decorrelated to a LEFT SEMI join whose condition is
    equi (l_orderkey) + residual (shipdate > orderdate + 45d). The equi
    component keeps it a hash semi-join — one shuffle on orderkey, date
    filter pushed to the orders scan."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q_only_late_supplier",
    """
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT l1.l_suppkey AS suppkey, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          )
    GROUP BY l1.l_suppkey
    """,
)
def q_only_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finished order ("late" = shipped >60 days after order
    date; the testdata lacks commit/receipt dates, so the late predicate is
    adapted — structure is Q21's EXISTS + NOT EXISTS pair verbatim).

    Plan: both subqueries decorrelate to hash semi/anti self-joins on
    l_orderkey — three shuffles on the same key, which AQE coalesces;
    orders joins in first so the late set is computed once."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.dropDuplicates(["l_orderkey", "l_suppkey"])
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    result = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return result.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).alias("numwait")
    )


@register(
    "q_dormant_rich_customers",
    f"""
    WITH thresh AS (
        SELECT {dround('AVG(c_acctbal)', 2)} AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment AS segment,
           COUNT(*) AS numcust,
           {dround('SUM(c_acctbal)', 2)} AS totacctbal
    FROM customer, thresh
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (avg positive balance) +
    NOT EXISTS (never placed an urgent order — every customer has SOME
    order in the testdata, so the predicate keeps the anti-join
    non-trivial), grouped. The 1-row threshold stays a DataFrame
    cross-joined in — Catalyst broadcasts it; the anti-join on o_custkey is
    the only real shuffle. Threshold compared on the 2-dp rounded value on
    both engines (sum-order noise can't flip membership)."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q_part_value_share",
    f"""
    WITH pv AS (
        SELECT l_partkey, {dround('SUM(l_extendedprice * (1 - l_discount))', 2)} AS part_value
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT {dround('SUM(part_value) * 0.0006', 2)} AS cutoff FROM pv)
    SELECT l_partkey, part_value
    FROM pv, tot
    WHERE part_value > cutoff
    """,
)
def q_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a scalar fraction of the global
    total. Aggregates once, derives the cutoff from the SAME aggregate
    (re-used plan subtree, 1-row broadcast), filters. Both engines compare
    2-dp-rounded part values against a 2-dp-rounded cutoff."""
    li = load(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "part_value"
        )
    )
    cutoff = pv.agg(F.round(F.sum("part_value") * 0.0006, 2).alias("cutoff"))
    return (
        pv.crossJoin(F.broadcast(cutoff))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select("l_partkey", "part_value")
    )


@register(
    "agg_grouping_sets",
    f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           {dround('SUM(o_totalprice)', 2)} AS total_value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (rollup/cube's general form — SURVEY §2.E
    lists them absent in the reference; Spark covers all three natively).
    One shuffle; Catalyst expands the sets map-side."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_value
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "win_time_range_rolling",
    f"""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_7d,
           {dround('SUM(value) OVER w', 2)} AS value_7d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user rolling 7-day event count and
    value sum — the frame kind SURVEY §2.F lists as absent in the
    reference (all its windows use default frames). Ordering on epoch
    MICROS on both engines so frame membership is identical; RANGE peers
    (equal timestamps) are included on both. Partitioned by user_id ->
    scales with user cardinality, no global sort."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-604_800_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 2).alias("value_7d"),
    )


@register(
    "q_supplier_part_count",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 7, 10, 14, 23, 25, 28, 38, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each part class,
    excluding a NOT-IN set of suppliers (Q16's complaint subquery, adapted
    to negative account balance — the testdata has no s_comment; the
    partsupp relationship is adapted to observed lineitem part-supplier
    pairs). NOT IN over a non-nullable key decorrelates to a LEFT ANTI
    join; the excluded set is tiny so it broadcasts. part filters land on
    the part scan, the part join broadcasts, and the distinct count is the
    standard two-phase expand — the only fact shuffle."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 14, 23, 25, 28, 38, 45))
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_dominant_supplier",
    """
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND p_name LIKE 'small%'
        GROUP BY l_partkey, l_suppkey
    ),
    part_tot AS (
        SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11'))
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM shipped JOIN part_tot USING (l_partkey)
          WHERE qty > 0.5 * total_qty
      )
    """,
)
def q_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries — suppliers (in a nation set)
    who shipped more than half a part's yearly volume of a name-filtered
    part (Q20's availqty>half-shipped threshold adapted to dominant-share;
    the testdata has no partsupp/availqty — structure preserved: inner
    per-(part,supplier) aggregate, correlated per-part scalar threshold,
    IN chained into the supplier scan).

    Plan: part-name filter broadcasts into the fact scan before the
    aggregate; per-pair and per-part aggregates share one shuffle on
    l_partkey (AQE reuses the partitioning); both IN-subqueries
    decorrelate to semi-joins — the nation one against a broadcast 3-row
    set, the qualifying-supplier one against an already-small aggregate.
    Quantities are integral doubles, so the half-share comparison is exact
    on both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    qualifying = (
        shipped.join(part_tot, "l_partkey")
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    nkeys = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))
        .select("n_nationkey")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(nkeys), s.s_nationkey == nkeys.n_nationkey, "left_semi")
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
