"""Round-4 batch-AC operators: CDF-distance two-sample tests on a bounded
value grid — Cramér–von Mises, tie-adjusted two-sample Anderson–Darling,
and Mood's median test, comparing URGENT vs LOW order-value distributions.

These complete the two-sample family (ext_two_sample_ks tests the max CDF
gap; CvM integrates the squared gap over the whole distribution; AD
re-weights the tails; Mood is the coarse location screen) with the same
exactness disciplines as the rest of the registry (scale_ops.py header):

- **Bounded grid, not raw ranks.** All three tests collapse order values
  to a $100 grid (FLOOR(o_totalprice / 100)) before any window runs, so
  the cumulative-count window sees <= ~6k rows regardless of corpus size
  — the same fix the wilcoxon/kendall keys use. Rank statistics on the
  binned distribution are exact statistics OF the binned distribution;
  the bin width is part of each key's contract.
- **Integer cross-multiplication.** Every CDF difference is kept as the
  integer (cum1*n2 - cum2*n1) (never the float F1-F2), squared in
  decimal(38,0)/HUGEINT, and only divided once at the end; per-cell
  terms that must sum in float are frozen to integer micro-units first.
- **HUGEINT->DOUBLE via VARCHAR** on the DuckDB side for every integer
  that can exceed 2^53 (DuckDB's native cast is not correctly rounded
  above 2^53; strtod is — and matches Spark's BigDecimal.doubleValue).

Reference parity: the reference exposes only dbt SQL models
(/root/reference/models/*.sql); these keys are beyond-reference
analytics surface mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load
from . import dround, register

# ---------------------------------------------------------------------------
# Shared grid: URGENT vs LOW order totals on a $100 grid
# ---------------------------------------------------------------------------

TS_P1 = "1-URGENT"  # sample 1
TS_P2 = "5-LOW"  # sample 2
TS_BIN = 100  # grid width in dollars (bounded-grid contract)

# Grid cells with per-sample counts and right-edge cumulative counts.
# The window is over the bounded grid (<= ~6k cells at any corpus size).
_GRID_SQL = f"""grid AS MATERIALIZED (
        SELECT g, c1, c2, c1 + c2 AS h,
               CAST(SUM(c1) OVER (ORDER BY g) AS BIGINT) AS m1,
               CAST(SUM(c2) OVER (ORDER BY g) AS BIGINT) AS m2,
               CAST(SUM(c1 + c2) OVER (ORDER BY g) AS BIGINT) AS hh
        FROM (
            SELECT CAST(FLOOR(o_totalprice / {TS_BIN}) AS BIGINT) AS g,
                   CAST(SUM(CASE WHEN o_orderpriority = '{TS_P1}' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                   CAST(SUM(CASE WHEN o_orderpriority = '{TS_P2}' THEN 1 ELSE 0 END) AS BIGINT) AS c2
            FROM orders
            WHERE o_orderpriority IN ('{TS_P1}', '{TS_P2}')
            GROUP BY 1
        )
    ),
    nn AS (
        SELECT MAX(m1) AS n1, MAX(m2) AS n2, MAX(hh) AS n
        FROM grid
    )"""


def _spark_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(g, c1, c2, h, m1, m2, hh) — $100-grid cells with cumulative counts.

    One conditional-aggregate shuffle down to the bounded grid, then a
    single-partition cumulative window over <= ~6k cells (bounded by the
    price range / TS_BIN, not by the corpus — safe at any scale)."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(TS_P1, TS_P2)
    )
    cells = (
        o.select(
            F.floor(F.col("o_totalprice") / TS_BIN).cast("bigint").alias("g"),
            F.when(F.col("o_orderpriority") == TS_P1, 1)
            .otherwise(0)
            .alias("i1"),
            F.when(F.col("o_orderpriority") == TS_P2, 1)
            .otherwise(0)
            .alias("i2"),
        )
        .groupBy("g")
        .agg(
            F.sum("i1").cast("bigint").alias("c1"),
            F.sum("i2").cast("bigint").alias("c2"),
        )
        .withColumn("h", F.col("c1") + F.col("c2"))
    )
    w = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
    return cells.select(
        "g",
        "c1",
        "c2",
        "h",
        F.sum("c1").over(w).cast("bigint").alias("m1"),
        F.sum("c2").over(w).cast("bigint").alias("m2"),
        F.sum("h").over(w).cast("bigint").alias("hh"),
    )


def _dec(col):
    return col.cast("decimal(38,0)")


# DuckDB: correctly-rounded HUGEINT/BIGINT -> DOUBLE via strtod.
def _vd(expr: str) -> str:
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


# ---------------------------------------------------------------------------
# ext_cramer_von_mises — integrated squared CDF distance
# ---------------------------------------------------------------------------

CVM_CRIT = 0.461  # asymptotic 5% point of the two-sample CvM criterion


@register(
    "ext_cramer_von_mises",
    f"""
    WITH {_GRID_SQL},
    s AS (
        SELECT CAST(SUM(CAST(g.m1 * n.n2 - g.m2 * n.n1 AS HUGEINT)
                        * (g.m1 * n.n2 - g.m2 * n.n1) * g.h) AS HUGEINT) AS ssum
        FROM grid g CROSS JOIN nn n
    )
    SELECT n.n1 AS n_urgent, n.n2 AS n_low,
           {dround(f"{_vd('s.ssum')} / (CAST(n.n1 * n.n2 AS DOUBLE) * (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)))", 6)} AS cvm_t,
           CAST({_vd('s.ssum')} / (CAST(n.n1 * n.n2 AS DOUBLE) * (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE))) > {CVM_CRIT} AS BOOLEAN) AS significant
    FROM s CROSS JOIN nn n
    """,
)
def ext_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises test: does the URGENT order-value
    distribution differ from the LOW one anywhere (not just at the max
    gap that ext_two_sample_ks sees)? T = n1*n2/N^3 * sum_cells
    h * (F1 - F2)^2, compared against the asymptotic 5% criterion
    {CVM_CRIT}.

    Determinism: the CDF gap per cell is the exact integer
    (m1*n2 - m2*n1); its square times the cell weight accumulates in
    decimal(38,0)/HUGEINT and is divided exactly once, with the HUGEINT
    routed to double through VARCHAR (strtod) so both engines see the
    identically-rounded value.

    Scale shape: one conditional aggregate down to the bounded $100
    grid, a <= ~6k-row cumulative window, and a scalar fold — no raw
    per-row ranks at any size. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    grid = _spark_grid(spark, sf_dir)
    nn = grid.agg(
        F.max("m1").alias("n1"),
        F.max("m2").alias("n2"),
        F.max("hh").alias("n"),
    )
    d = F.col("m1") * F.col("n2") - F.col("m2") * F.col("n1")
    s = (
        grid.crossJoin(F.broadcast(nn))
        .select((_dec(d) * d * F.col("h")).alias("t"))
        .agg(F.sum("t").cast("decimal(38,0)").alias("ssum"))
    )
    t_stat = F.col("ssum").cast("double") / (
        (F.col("n1") * F.col("n2")).cast("double")
        * (
            F.col("n").cast("double")
            * F.col("n").cast("double")
            * F.col("n").cast("double")
        )
    )
    return s.crossJoin(F.broadcast(nn)).select(
        F.col("n1").alias("n_urgent"),
        F.col("n2").alias("n_low"),
        F.round(t_stat, 6).alias("cvm_t"),
        (t_stat > CVM_CRIT).alias("significant"),
    )


# ---------------------------------------------------------------------------
# ext_anderson_darling_2s — tail-weighted CDF distance
# ---------------------------------------------------------------------------

AD_CRIT = 2.492  # asymptotic 5% point of the AD limit distribution


@register(
    "ext_anderson_darling_2s",
    f"""
    WITH {_GRID_SQL},
    terms AS (
        SELECT CAST(ROUND(CAST(g.h AS DOUBLE)
                          * {_vd('CAST(n.n * g.m1 - n.n1 * g.hh AS HUGEINT) * (n.n * g.m1 - n.n1 * g.hh)')}
                          / CAST(g.hh * (n.n - g.hh) AS DOUBLE)
                          * 1000000.0) AS BIGINT) AS t_micro
        FROM grid g CROSS JOIN nn n
        WHERE g.hh < n.n
    ),
    s AS (
        SELECT CAST(SUM(CAST(t_micro AS HUGEINT)) AS HUGEINT) AS smicro FROM terms
    )
    SELECT n.n1 AS n_urgent, n.n2 AS n_low,
           {dround(f"{_vd('s.smicro')} / 1000000.0 / CAST(n.n1 * n.n2 AS DOUBLE)", 6)} AS ad_a2,
           CAST({_vd('s.smicro')} / 1000000.0 / CAST(n.n1 * n.n2 AS DOUBLE) > {AD_CRIT} AS BOOLEAN) AS significant
    FROM s CROSS JOIN nn n
    """,
)
def ext_anderson_darling_2s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson–Darling test on the same $100 grid — the
    tail-sensitive complement to ext_cramer_von_mises (the 1/(H(N-H))
    weight blows up CDF gaps near the extremes, where KS and CvM are
    blind). Discrete tie-adjusted form: A2 = (1/(n1*n2)) * sum_cells
    h * (N*M1 - n1*H)^2 / (H*(N-H)) over cells with H < N, flagged
    against the asymptotic 5% point {AD_CRIT}.

    Determinism: the numerator (N*M1 - n1*H)^2 is exact HUGEINT /
    decimal(38,0) routed to double via VARCHAR; each cell's term is
    frozen to integer micro-units BEFORE the sum (float addition order
    never matters), and the micro-sum accumulates in 128-bit.

    Scale shape: identical to ext_cramer_von_mises — bounded-grid
    window plus a scalar fold. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    grid = _spark_grid(spark, sf_dir)
    nn = grid.agg(
        F.max("m1").alias("n1"),
        F.max("m2").alias("n2"),
        F.max("hh").alias("n"),
    )
    num = F.col("n") * F.col("m1") - F.col("n1") * F.col("hh")
    t_micro = F.round(
        F.col("h").cast("double")
        * (_dec(num) * num).cast("double")
        / (F.col("hh") * (F.col("n") - F.col("hh"))).cast("double")
        * 1000000.0,
        0,
    ).cast("bigint")
    s = (
        grid.crossJoin(F.broadcast(nn))
        .filter(F.col("hh") < F.col("n"))
        .select(t_micro.alias("t_micro"))
        .agg(F.sum(_dec(F.col("t_micro"))).cast("decimal(38,0)").alias("smicro"))
    )
    a2 = (
        F.col("smicro").cast("double")
        / 1000000.0
        / (F.col("n1") * F.col("n2")).cast("double")
    )
    return s.crossJoin(F.broadcast(nn)).select(
        F.col("n1").alias("n_urgent"),
        F.col("n2").alias("n_low"),
        F.round(a2, 6).alias("ad_a2"),
        (a2 > AD_CRIT).alias("significant"),
    )


# ---------------------------------------------------------------------------
# ext_mood_median — coarse location screen (2x2 chi-square at the median)
# ---------------------------------------------------------------------------

MOOD_CRIT = 3.841  # chi2(1) 5% critical value


@register(
    "ext_mood_median",
    f"""
    WITH {_GRID_SQL},
    med AS (
        SELECT MIN(g.g) AS mg
        FROM grid g CROSS JOIN nn n
        WHERE g.hh * 2 >= n.n
    ),
    cell AS (
        SELECT CAST(MAX(CASE WHEN g.g <= m.mg THEN g.m1 ELSE 0 END) AS BIGINT) AS a,
               CAST(MAX(CASE WHEN g.g <= m.mg THEN g.m2 ELSE 0 END) AS BIGINT) AS c
        FROM grid g CROSS JOIN med m
    )
    SELECT m.mg * {TS_BIN} AS median_bin_dollars,
           c.a AS urgent_le, n.n1 - c.a AS urgent_gt,
           c.c AS low_le, n.n2 - c.c AS low_gt,
           {dround(f"CAST(n.n AS DOUBLE) * {_vd('CAST(c.a * (n.n2 - c.c) - c.c * (n.n1 - c.a) AS HUGEINT) * (c.a * (n.n2 - c.c) - c.c * (n.n1 - c.a))')} / (CAST(n.n1 * n.n2 AS DOUBLE) * CAST((c.a + c.c) * (n.n - c.a - c.c) AS DOUBLE))", 6)} AS chi2,
           CAST(CAST(n.n AS DOUBLE) * {_vd('CAST(c.a * (n.n2 - c.c) - c.c * (n.n1 - c.a) AS HUGEINT) * (c.a * (n.n2 - c.c) - c.c * (n.n1 - c.a))')} / (CAST(n.n1 * n.n2 AS DOUBLE) * CAST((c.a + c.c) * (n.n - c.a - c.c) AS DOUBLE)) > {MOOD_CRIT} AS BOOLEAN) AS significant
    FROM cell c CROSS JOIN nn n CROSS JOIN med m
    """,
)
def ext_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: split both samples at the pooled median cell
    (first $100 grid cell whose cumulative count reaches N/2) and
    chi-square the resulting 2x2 table — the robust location screen
    that needs no distributional assumptions at all. chi2 =
    N*(a*d - b*c)^2 / (n1*n2*(a+c)*(b+d)) vs the chi2(1) 5% point
    {MOOD_CRIT}.

    Determinism: the median cell is an integer-comparison argmin
    (hh*2 >= N); (a*d - b*c)^2 is exact 128-bit cross-multiplication
    routed to double via VARCHAR; the denominator is a pinned product
    of exactly-converted int64 doubles.

    Scale shape: the 2x2 table falls out of the same bounded-grid
    cumulative window with two broadcast scalars — no additional
    shuffle. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    grid = _spark_grid(spark, sf_dir)
    nn = grid.agg(
        F.max("m1").alias("n1"),
        F.max("m2").alias("n2"),
        F.max("hh").alias("n"),
    )
    med = (
        grid.crossJoin(F.broadcast(nn))
        .filter(F.col("hh") * 2 >= F.col("n"))
        .agg(F.min("g").alias("mg"))
    )
    cell = (
        grid.crossJoin(F.broadcast(med))
        .agg(
            F.max(
                F.when(F.col("g") <= F.col("mg"), F.col("m1")).otherwise(0)
            )
            .cast("bigint")
            .alias("a"),
            F.max(
                F.when(F.col("g") <= F.col("mg"), F.col("m2")).otherwise(0)
            )
            .cast("bigint")
            .alias("c"),
        )
    )
    b = F.col("n1") - F.col("a")
    d_ = F.col("n2") - F.col("c")
    det = F.col("a") * d_ - F.col("c") * b
    chi2 = (
        F.col("n").cast("double")
        * (_dec(det) * det).cast("double")
        / (
            (F.col("n1") * F.col("n2")).cast("double")
            * (
                (F.col("a") + F.col("c"))
                * (F.col("n") - F.col("a") - F.col("c"))
            ).cast("double")
        )
    )
    return (
        cell.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(med))
        .select(
            (F.col("mg") * TS_BIN).alias("median_bin_dollars"),
            F.col("a").alias("urgent_le"),
            b.alias("urgent_gt"),
            F.col("c").alias("low_le"),
            d_.alias("low_gt"),
            F.round(chi2, 6).alias("chi2"),
            (chi2 > MOOD_CRIT).alias("significant"),
        )
    )
