"""Round-5 fifth operator batch.

Three named-technique keys (batch recipe: oracle twin + automatic
plan-quality sweep + BASELINE row in the same commit):

- ext_eval_qini_uplift     decile uplift curve + Qini-style AUUC
- ext_fit_lognormal        closed-form lognormal MLE + quantile audit
- ext_causal_poststrat_ate post-stratification ATE (the third leg of the
                           causal adjustment trio: IPW / DID / strata)

Cited parity anchor: /root/reference/models (beyond-reference surface —
the reference's dbt project defines no analytics beyond its 12 models;
these keys extend the engine the way its Databricks warehouse would be
used downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load
from . import dround, register
from .r5d_ops import IPW_SPLIT, IPW_W1, IPW_W2

# ---------------------------------------------------------------------------
# ext_eval_qini_uplift — decile uplift curve and Qini-style AUUC
# ---------------------------------------------------------------------------

QINI_DECILES = 10


@register(
    "ext_eval_qini_uplift",
    f"""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INTEGER) AS treat,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{IPW_SPLIT}' THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
               {dround(f"AVG(CASE WHEN ts < TIMESTAMP '{IPW_SPLIT}' THEN value END)", 6)} AS v_pre,
               {dround(f"AVG(CASE WHEN ts >= TIMESTAMP '{IPW_SPLIT}' THEN value END)", 6)} AS y
        FROM events GROUP BY user_id
    ), scored AS (
        SELECT *,
               {dround(f'{IPW_W1} * (n_pre - 33.0) + {IPW_W2} * (COALESCE(v_pre, 50.0) - 50.0)', 6)} AS uplift_score
        FROM per_user WHERE y IS NOT NULL
    ), ranked AS (
        SELECT *, CAST(NTILE({QINI_DECILES}) OVER (ORDER BY uplift_score DESC, user_id) AS BIGINT) AS decile
        FROM scored
    ), cells AS (
        SELECT decile,
               CAST(SUM(treat) AS BIGINT) AS n_t,
               CAST(SUM(1 - treat) AS BIGINT) AS n_c,
               {dround('SUM(CASE WHEN treat = 1 THEN y ELSE 0.0 END)', 6)} AS sum_yt,
               {dround('SUM(CASE WHEN treat = 0 THEN y ELSE 0.0 END)', 6)} AS sum_yc
        FROM ranked GROUP BY decile
    ), cum AS (
        SELECT decile, n_t, n_c,
               CAST(SUM(n_t) OVER (ORDER BY decile) AS BIGINT) AS cum_nt,
               CAST(SUM(n_c) OVER (ORDER BY decile) AS BIGINT) AS cum_nc,
               SUM(sum_yt) OVER (ORDER BY decile) AS cum_yt,
               SUM(sum_yc) OVER (ORDER BY decile) AS cum_yc
        FROM cells
    ), curve AS (
        SELECT decile, n_t, n_c, cum_nt, cum_nc,
               {dround('cum_yt / cum_nt - cum_yc / cum_nc', 6)} AS cum_uplift
        FROM cum
    )
    SELECT decile, n_t, n_c, cum_nt, cum_nc, cum_uplift,
           {dround(f'SUM(cum_uplift) OVER () / {QINI_DECILES}', 6)} AS auuc
    FROM curve
    """,
)
def ext_eval_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-model evaluation curve (Radcliffe's Qini family): rank
    units by a FROZEN uplift score (the documented linear model on
    pre-period covariates — sharing ext_causal_ipw_ate's feature
    conventions), cut into {QINI_DECILES} deciles, and report the
    cumulative treated-minus-control mean outcome at each depth plus the
    AUUC (area under the cumulative-uplift curve, the mean of the
    per-decile cumulative uplifts). A useful uplift score shows high
    cum_uplift at shallow deciles decaying toward the full-population
    ATE at depth 10; a useless one is flat — this key is how that claim
    gets CHECKED rather than assumed.

    Float discipline: per-user outcomes rounded at 6dp; per-decile sums
    rounded before the ORDERED cumulative windows (prefix sums fold in
    frame order — deterministic); the curve ratio and AUUC compose from
    rounded operands.

    Scale shape: one per-user conditional aggregate, a users-sized
    NTILE rank (at 100 TB the decile cuts come from approx_percentile
    of the score — same downstream schema), one decile-grid aggregate,
    then {QINI_DECILES}-row windows. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    split = F.lit(IPW_SPLIT).cast("timestamp")
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pre"),
            F.round(F.avg(F.when(F.col("ts") < split, F.col("value"))), 6).alias(
                "v_pre"
            ),
            F.round(F.avg(F.when(F.col("ts") >= split, F.col("value"))), 6).alias(
                "y"
            ),
        )
        .withColumn("treat", (F.col("user_id") % 2).cast("int"))
    )
    scored = per_user.filter(F.col("y").isNotNull()).withColumn(
        "uplift_score",
        F.round(
            IPW_W1 * (F.col("n_pre") - 33.0)
            + IPW_W2 * (F.coalesce(F.col("v_pre"), F.lit(50.0)) - 50.0),
            6,
        ),
    )
    w_rank = Window.orderBy(F.desc("uplift_score"), "user_id")
    ranked = scored.withColumn(
        "decile", F.ntile(QINI_DECILES).over(w_rank).cast("bigint")
    )
    t = F.col("treat")
    cells = ranked.groupBy("decile").agg(
        F.sum(t).cast("bigint").alias("n_t"),
        F.sum(1 - t).cast("bigint").alias("n_c"),
        F.round(F.sum(F.when(t == 1, F.col("y")).otherwise(0.0)), 6).alias("sum_yt"),
        F.round(F.sum(F.when(t == 0, F.col("y")).otherwise(0.0)), 6).alias("sum_yc"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "decile",
        "n_t",
        "n_c",
        F.sum("n_t").over(w_cum).cast("bigint").alias("cum_nt"),
        F.sum("n_c").over(w_cum).cast("bigint").alias("cum_nc"),
        F.sum("sum_yt").over(w_cum).alias("cum_yt"),
        F.sum("sum_yc").over(w_cum).alias("cum_yc"),
    )
    curve = cum.select(
        "decile",
        "n_t",
        "n_c",
        "cum_nt",
        "cum_nc",
        F.round(
            F.col("cum_yt") / F.col("cum_nt") - F.col("cum_yc") / F.col("cum_nc"), 6
        ).alias("cum_uplift"),
    )
    w_all = Window.partitionBy(F.lit(1))
    return curve.withColumn(
        "auuc", F.round(F.sum("cum_uplift").over(w_all) / QINI_DECILES, 6)
    )


ext_eval_qini_uplift.__doc__ = ext_eval_qini_uplift.__doc__.replace(
    "{QINI_DECILES}", str(QINI_DECILES)
)


# ---------------------------------------------------------------------------
# ext_fit_lognormal — closed-form lognormal MLE with a quantile audit
# ---------------------------------------------------------------------------

# z_{0.9} of the standard normal, inlined as the identical IEEE literal on
# both engines (string-parsed on the DuckDB side — strtod is correctly
# rounded; a bare 17-digit numeric literal would parse as DECIMAL there).
LN_Z90 = "1.2815515655446004"


@register(
    "ext_fit_lognormal",
    f"""
    WITH lx AS (
        SELECT event_type, ln(value) AS l FROM events WHERE value > 0
    ), mu AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               {dround('AVG(l)', 6)} AS mu_log
        FROM lx GROUP BY event_type
    ), sg AS (
        SELECT l.event_type, m.n, m.mu_log,
               {dround('sqrt(AVG((l.l - m.mu_log) * (l.l - m.mu_log)))', 6)} AS sigma_log
        FROM lx l JOIN mu m USING (event_type)
        GROUP BY l.event_type, m.n, m.mu_log
    ), emp AS (
        SELECT event_type,
               {dround('quantile_cont(value, 0.5)', 6)} AS emp_median,
               {dround('quantile_cont(value, 0.9)', 6)} AS emp_p90
        FROM events WHERE value > 0 GROUP BY event_type
    ), fit AS (
        SELECT s.event_type, s.n, s.mu_log, s.sigma_log,
               {dround('exp(s.mu_log)', 6)} AS fit_median,
               {dround(f"exp(s.mu_log + CAST('{LN_Z90}' AS DOUBLE) * s.sigma_log)", 6)} AS fit_p90,
               e.emp_median, e.emp_p90
        FROM sg s JOIN emp e USING (event_type)
    )
    SELECT event_type, n, mu_log, sigma_log,
           fit_median, emp_median, fit_p90, emp_p90,
           {dround('fit_median - emp_median', 6)} AS median_err,
           {dround('fit_p90 - emp_p90', 6)} AS p90_err
    FROM fit
    """,
)
def ext_fit_lognormal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form lognormal MLE per metric — mu = mean(ln x), sigma =
    sqrt of the centered second moment of ln x — with the quantile audit
    that says whether the fit is USABLE: the fitted median exp(mu) and
    p90 exp(mu + z90*sigma) against the empirical quantiles, and their
    gaps. The standard parametric model for heavy-tailed value/latency
    distributions; large p90_err = the tail is NOT lognormal and
    downstream extrapolation (capacity planning, outlier cut at mu+k*
    sigma in log space) would mislead — measured here, not assumed.

    Float discipline: the two-pass centered moment with the 6dp-rounded
    per-group mean joined back; z_0.9 inlined as the identical IEEE
    literal on both engines (VARCHAR-parsed in DuckDB — a bare 17-digit
    literal would land in the DECIMAL lane); exp of rounded operands,
    terminal 6dp rounds.

    Scale shape: two fact passes for the log moments (broadcast means
    between), one exact-quantile pass per group for the audit (the
    expensive exact sort is the AUDIT — production keeps the closed-form
    fit, which is one scan). Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    lx = ev.select("event_type", F.log("value").alias("l"))
    # r10: the per-type log-mean (rows == groups) is pinned — its fact
    # scan replayed inside the second-moment pass (plan audit: 3 fact
    # passes is the floor: mean, moment, quantile audit)
    mu = lx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("l"), 6).alias("mu_log"),
    ).localCheckpoint(eager=False)
    d = F.col("l") - F.col("mu_log")
    sg = (
        lx.join(F.broadcast(mu), "event_type")
        .groupBy("event_type", "n", "mu_log")
        .agg(F.round(F.sqrt(F.avg(d * d)), 6).alias("sigma_log"))
    )
    emp = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("emp_median"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("emp_p90"),
    )
    z90 = F.lit(float(LN_Z90))
    fit = sg.join(emp, "event_type").select(
        "event_type",
        "n",
        "mu_log",
        "sigma_log",
        F.round(F.exp(F.col("mu_log")), 6).alias("fit_median"),
        F.round(F.exp(F.col("mu_log") + z90 * F.col("sigma_log")), 6).alias(
            "fit_p90"
        ),
        "emp_median",
        "emp_p90",
    )
    return fit.select(
        "event_type",
        "n",
        "mu_log",
        "sigma_log",
        "fit_median",
        "emp_median",
        "fit_p90",
        "emp_p90",
        F.round(F.col("fit_median") - F.col("emp_median"), 6).alias("median_err"),
        F.round(F.col("fit_p90") - F.col("emp_p90"), 6).alias("p90_err"),
    )


# ---------------------------------------------------------------------------
# ext_causal_poststrat_ate — post-stratification ATE
# ---------------------------------------------------------------------------

PS_BIN = 10  # stratum width on the pre-period event count


@register(
    "ext_causal_poststrat_ate",
    f"""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INTEGER) AS treat,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{IPW_SPLIT}' THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
               {dround(f"AVG(CASE WHEN ts >= TIMESTAMP '{IPW_SPLIT}' THEN value END)", 6)} AS y
        FROM events GROUP BY user_id
    ), strat AS (
        SELECT CAST(FLOOR(n_pre / {PS_BIN}) AS BIGINT) AS stratum, treat, y
        FROM per_user WHERE y IS NOT NULL
    ), cells AS (
        SELECT stratum,
               CAST(SUM(treat) AS BIGINT) AS n_t,
               CAST(SUM(1 - treat) AS BIGINT) AS n_c,
               {dround('AVG(CASE WHEN treat = 1 THEN y END)', 6)} AS mean_t,
               {dround('AVG(CASE WHEN treat = 0 THEN y END)', 6)} AS mean_c
        FROM strat GROUP BY stratum
    ), usable AS (
        SELECT *, {dround('mean_t - mean_c', 6)} AS stratum_ate,
               n_t + n_c AS n_s
        FROM cells WHERE n_t > 0 AND n_c > 0
    )
    SELECT stratum, n_t, n_c, mean_t, mean_c, stratum_ate,
           {dround('n_s * 1.0 / SUM(n_s) OVER ()', 6)} AS weight,
           {dround('SUM(stratum_ate * n_s) OVER () / SUM(n_s) OVER ()', 6)} AS ate_poststrat
    FROM usable
    """,
)
def ext_causal_poststrat_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratification ATE — the third leg of the causal-adjustment
    trio (ext_causal_ipw_ate reweights, ext_promo_effect_did differences
    out time, this one BLOCKS): users are stratified by their pre-period
    activity level (fixed {PS_BIN}-wide count bands — a deterministic,
    corpus-size-independent blocking key), the treated-minus-control
    mean is taken WITHIN each stratum, and strata combine weighted by
    size. Equivalent to exact matching on the coarsened covariate; the
    per-stratum rows expose exactly where the effect is heterogeneous,
    which the single IPW number hides. Strata missing an arm are
    excluded (no within-stratum contrast exists; with a hash split this
    only happens in near-empty tail strata).

    Float discipline: per-user outcomes and per-stratum means rounded at
    6dp; stratum ATEs compose from rounded means; the pooled estimate is
    a ratio of sums of (rounded ate x integer weight) over the bounded
    stratum grid.

    Scale shape: one per-user conditional aggregate, one stratum-grid
    aggregate, grid-sized windows — no joins. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    split = F.lit(IPW_SPLIT).cast("timestamp")
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pre"),
            F.round(F.avg(F.when(F.col("ts") >= split, F.col("value"))), 6).alias(
                "y"
            ),
        )
        .withColumn("treat", (F.col("user_id") % 2).cast("int"))
    )
    strat = per_user.filter(F.col("y").isNotNull()).select(
        F.floor(F.col("n_pre") / PS_BIN).cast("bigint").alias("stratum"),
        "treat",
        "y",
    )
    t = F.col("treat")
    cells = strat.groupBy("stratum").agg(
        F.sum(t).cast("bigint").alias("n_t"),
        F.sum(1 - t).cast("bigint").alias("n_c"),
        F.round(F.avg(F.when(t == 1, F.col("y"))), 6).alias("mean_t"),
        F.round(F.avg(F.when(t == 0, F.col("y"))), 6).alias("mean_c"),
    )
    usable = (
        cells.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
        .withColumn("stratum_ate", F.round(F.col("mean_t") - F.col("mean_c"), 6))
        .withColumn("n_s", F.col("n_t") + F.col("n_c"))
    )
    w_all = Window.partitionBy(F.lit(1))
    return usable.select(
        "stratum",
        "n_t",
        "n_c",
        "mean_t",
        "mean_c",
        "stratum_ate",
        F.round(F.col("n_s") * 1.0 / F.sum("n_s").over(w_all), 6).alias("weight"),
        F.round(
            F.sum(F.col("stratum_ate") * F.col("n_s")).over(w_all)
            / F.sum("n_s").over(w_all),
            6,
        ).alias("ate_poststrat"),
    )


ext_causal_poststrat_ate.__doc__ = ext_causal_poststrat_ate.__doc__.replace(
    "{PS_BIN}", str(PS_BIN)
)
