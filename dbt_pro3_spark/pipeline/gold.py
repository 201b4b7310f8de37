"""Gold layer: the four analytics marts, faithful to models/gold/*.sql.

Structural note that is SEMANTICS, not just performance (SURVEY §4):
each mart pre-aggregates metrics per key in CTE-equivalents and THEN
left-joins them — joining first and aggregating later would double-count
through the 1—N fan-out. The DataFrame stages below preserve that shape,
which is also the scale-correct plan (aggregate early, join small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rdate(run_date: str | None) -> F.Column:
    """Report-date expression: the injected run date when the caller provides
    one (deterministic runs / pinned goldens), else the reference semantics
    (CURRENT_DATE in models/gold/*.sql). Never pin a golden constant over the
    CURRENT_DATE path — it is valid for exactly one calendar day."""
    return F.lit(run_date).cast("date") if run_date is not None else F.current_date()


def gold_customer_360(
    customers_silver: DataFrame, policies_silver: DataFrame, claims_silver: DataFrame,
    run_date: str | None = None,
) -> DataFrame:
    """gold_customer_360.sql:21-149."""
    cb = customers_silver.filter(F.col("invalid_email_flag") == 0).select(
        "customer_id", "full_name", "age", "annual_income", "credit_score",
        "state", "marital_status", "occupation", "processed_at",
    )
    pm = (
        policies_silver.filter(
            (F.col("missing_customer_id_flag") == 0)
            & (F.col("invalid_premium_amount_flag") == 0)
        )
        .groupBy("customer_id")
        .agg(
            F.countDistinct("policy_id").alias("total_policies"),
            F.sum("premium_amount").alias("total_annual_premium"),
            F.avg("premium_amount").alias("avg_policy_premium"),
            F.sum("coverage_amount").alias("total_coverage"),
            F.avg("coverage_amount").alias("avg_coverage"),
            F.min("start_date").alias("first_policy_date"),
            F.max("end_date").alias("latest_policy_end"),
            F.count(F.when(F.col("status") == "ACTIVE", 1)).alias("active_policies"),
            F.count(F.when(F.col("status") == "CANCELLED", 1)).alias("cancelled_policies"),
        )
    )
    cm = (
        claims_silver.filter(F.col("missing_policy_flag") == 0)
        .join(
            policies_silver.select("policy_id", F.col("customer_id").alias("p_customer_id")),
            "policy_id",
        )
        .groupBy(F.col("p_customer_id").alias("customer_id"))
        .agg(
            F.countDistinct("claim_id").alias("total_claims"),
            F.sum("claim_amount").alias("total_claimed"),
            F.sum("settled_amount").alias("total_settled"),
            F.avg("claim_amount").alias("avg_claim_amount"),
            F.avg("reporting_delay_days").alias("avg_reporting_delay"),
            F.count(F.when(F.col("fraud_indicator") == 1, 1)).alias("potential_fraud_claims"),
            F.min("claim_date").alias("first_claim_date"),
            F.max("claim_date").alias("latest_claim_date"),
        )
    )

    j = cb.join(pm, "customer_id", "left").join(cm, "customer_id", "left")
    premium0 = F.coalesce("total_annual_premium", F.lit(0))
    settled0 = F.coalesce("total_settled", F.lit(0))
    claims0 = F.coalesce("total_claims", F.lit(0))
    policies0 = F.coalesce("total_policies", F.lit(0))
    profit = premium0 - settled0
    return j.select(
        "customer_id",
        "full_name",
        "age",
        F.when(F.col("age") < 25, "Gen Z")
        .when(F.col("age") < 35, "Millennial")
        .when(F.col("age") < 55, "Gen X")
        .otherwise("Boomer+")
        .alias("generation_segment"),
        "annual_income",
        "credit_score",
        "state",
        "marital_status",
        "occupation",
        policies0.alias("total_policies"),
        premium0.alias("total_annual_premium"),
        F.coalesce("avg_policy_premium", F.lit(0)).alias("avg_policy_premium"),
        F.coalesce("total_coverage", F.lit(0)).alias("total_coverage"),
        F.coalesce("active_policies", F.lit(0)).alias("active_policies"),
        F.coalesce("cancelled_policies", F.lit(0)).alias("cancelled_policies"),
        "first_policy_date",
        "latest_policy_end",
        claims0.alias("total_claims"),
        F.coalesce("total_claimed", F.lit(0)).alias("total_claimed"),
        settled0.alias("total_settled"),
        F.coalesce("avg_claim_amount", F.lit(0)).alias("avg_claim_amount"),
        F.coalesce("potential_fraud_claims", F.lit(0)).alias("potential_fraud_claims"),
        profit.alias("customer_lifetime_profit"),
        F.when(premium0 == 0, F.lit(0))
        .otherwise(settled0 / F.col("total_annual_premium"))
        .alias("loss_ratio"),
        F.when(policies0 == 0, F.lit(0))
        .otherwise(claims0.cast("double") / F.col("total_policies"))
        .alias("claims_frequency"),
        F.when(profit > 10000, "High Value")
        .when(profit > 5000, "Medium Value")
        .when(profit > 0, "Low Value")
        .otherwise("Loss Making")
        .alias("customer_value_segment"),
        F.when(claims0 == 0, "No Claims")
        .when(claims0.cast("double") / F.coalesce("total_policies", F.lit(1)) < 0.1, "Low Risk")
        .when(claims0.cast("double") / F.coalesce("total_policies", F.lit(1)) < 0.3, "Medium Risk")
        .otherwise("High Risk")
        .alias("risk_tier"),
        F.when(F.col("latest_policy_end") < _rdate(run_date), 1).otherwise(0).alias("churned_flag"),
        F.when(F.coalesce("potential_fraud_claims", F.lit(0)) > 0, 1)
        .otherwise(0)
        .alias("fraud_flag"),
        _rdate(run_date).alias("report_date"),
        "processed_at",
    )


def gold_policy_performance(
    policies_silver: DataFrame, claims_silver: DataFrame,
    run_date: str | None = None,
) -> DataFrame:
    """gold_policy_performance.sql:21-126."""
    pb = (
        policies_silver.filter(
            (F.col("invalid_premium_amount_flag") == 0)
            & (F.col("invalid_coverage_amount_flag") == 0)
            & (F.col("invalid_date_range_flag") == 0)
        )
        .groupBy(
            "policy_type",
            "status",
            "payment_frequency",
            F.date_trunc("month", F.col("start_date")).alias("policy_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("policy_count"),
            F.sum("premium_amount").alias("total_premium_revenue"),
            F.sum("coverage_amount").alias("total_coverage_exposure"),
            F.avg("premium_amount").alias("avg_premium"),
            F.avg("coverage_amount").alias("avg_coverage"),
            F.avg("deductible").alias("avg_deductible"),
            F.avg("policy_duration_days").alias("avg_policy_duration"),
        )
    )
    cp = (
        claims_silver.filter(F.col("missing_policy_flag") == 0)
        .join(policies_silver.select("policy_id", "policy_type"), "policy_id")
        .groupBy(
            "policy_type", F.date_trunc("month", F.col("claim_date")).alias("claim_month")
        )
        .agg(
            F.countDistinct("claim_id").alias("total_claims"),
            F.sum("claim_amount").alias("total_claim_amount"),
            F.sum("settled_amount").alias("total_settled_amount"),
            F.avg("claim_amount").alias("avg_claim_severity"),
            F.avg("reporting_delay_days").alias("avg_reporting_delay"),
            F.count(F.when(F.col("fraud_indicator") == 1, 1)).alias("fraud_claims"),
        )
    )
    j = pb.join(
        cp,
        (pb.policy_type == cp.policy_type) & (pb.policy_month == cp.claim_month),
        "left",
    ).drop(cp.policy_type)
    settled0 = F.coalesce("total_settled_amount", F.lit(0))
    claims0 = F.coalesce("total_claims", F.lit(0))
    lr = settled0 / F.nullif(F.col("total_premium_revenue"), F.lit(0))
    w = Window.partitionBy("policy_type").orderBy("policy_month")
    return j.select(
        "policy_type",
        "status",
        "payment_frequency",
        "policy_month",
        "policy_count",
        "total_premium_revenue",
        "total_coverage_exposure",
        "avg_premium",
        "avg_coverage",
        "avg_deductible",
        "avg_policy_duration",
        claims0.alias("total_claims"),
        F.coalesce("total_claim_amount", F.lit(0)).alias("total_claim_amount"),
        settled0.alias("total_settled_amount"),
        F.coalesce("avg_claim_severity", F.lit(0)).alias("avg_claim_severity"),
        F.coalesce("avg_reporting_delay", F.lit(0)).alias("avg_reporting_delay"),
        F.coalesce("fraud_claims", F.lit(0)).alias("fraud_claims"),
        F.when(
            F.col("total_premium_revenue") > 0,
            settled0 / F.col("total_premium_revenue"),
        )
        .otherwise(0)
        .alias("loss_ratio"),
        F.when(
            F.col("policy_count") > 0, claims0.cast("double") / F.col("policy_count")
        )
        .otherwise(0)
        .alias("claims_frequency"),
        (F.col("total_premium_revenue") - settled0).alias("underwriting_profit"),
        F.when(
            claims0 > 0, F.col("fraud_claims").cast("double") / F.col("total_claims")
        )
        .otherwise(0)
        .alias("fraud_rate"),
        F.when(lr <= 0.6, "Excellent")
        .when(lr <= 0.8, "Good")
        .when(lr <= 1.0, "Average")
        .otherwise("Poor")
        .alias("performance_tier"),
        F.lag("total_premium_revenue", 12).over(w).alias("premium_revenue_prev_year"),
        F.lag("policy_count", 12).over(w).alias("policy_count_prev_year"),
        _rdate(run_date).alias("report_date"),
    )


def gold_claims_operations(
    claims_silver: DataFrame, policies_silver: DataFrame, customers_silver: DataFrame,
    run_date: str | None = None,
) -> DataFrame:
    """gold_claims_operations.sql:21-128."""
    cb = (
        claims_silver.filter(F.col("missing_policy_flag") == 0)
        .join(
            policies_silver.select(
                "policy_id", "policy_type", F.col("customer_id").alias("p_customer_id")
            ),
            "policy_id",
        )
        .join(
            customers_silver.select(
                F.col("customer_id").alias("p_customer_id"),
                F.col("state").alias("customer_state"),
                F.col("age").alias("customer_age"),
            ),
            "p_customer_id",
        )
        .groupBy(
            "claim_type",
            "severity",
            "status",
            "adjuster_id",
            F.date_trunc("month", F.col("claim_date")).alias("claim_month"),
            "policy_type",
            "customer_state",
            "customer_age",
        )
        .agg(
            F.count(F.lit(1)).alias("claim_count"),
            F.sum("claim_amount").alias("total_claim_amount"),
            F.sum("settled_amount").alias("total_settled_amount"),
            F.avg("claim_amount").alias("avg_claim_amount"),
            F.avg("settled_amount").alias("avg_settled_amount"),
            F.avg("reporting_delay_days").alias("avg_reporting_delay"),
            F.avg("settlement_ratio").alias("avg_settlement_ratio"),
            F.count(F.when(F.col("fraud_indicator") == 1, 1)).alias("potential_fraud_cases"),
        )
    )
    ap = (
        claims_silver.filter(F.col("adjuster_id").isNotNull())
        .groupBy("adjuster_id")
        .agg(
            F.count(F.lit(1)).alias("total_claims_handled"),
            F.avg("settlement_ratio").alias("ap_avg_settlement_ratio"),
            F.avg("reporting_delay_days").alias("avg_processing_time"),
            F.sum(F.when(F.col("fraud_indicator") == 1, 1).otherwise(0)).alias(
                "fraud_cases_detected"
            ),
        )
    )
    j = cb.join(ap, "adjuster_id", "left")
    w = Window.partitionBy("claim_type").orderBy("claim_month")
    return j.select(
        "claim_type",
        "severity",
        "status",
        "adjuster_id",
        "claim_month",
        "policy_type",
        "customer_state",
        "claim_count",
        "total_claim_amount",
        "total_settled_amount",
        "avg_claim_amount",
        "avg_settled_amount",
        "avg_reporting_delay",
        "avg_settlement_ratio",
        "potential_fraud_cases",
        F.when(
            F.col("claim_count") > 0,
            F.col("potential_fraud_cases").cast("double") / F.col("claim_count"),
        )
        .otherwise(0)
        .alias("fraud_rate"),
        F.col("total_claims_handled").alias("adjuster_total_claims"),
        F.col("ap_avg_settlement_ratio").alias("adjuster_avg_settlement_ratio"),
        F.col("avg_processing_time").alias("adjuster_avg_processing_time"),
        F.col("fraud_cases_detected").alias("adjuster_fraud_detected"),
        F.when(
            (F.col("ap_avg_settlement_ratio") >= 0.9) & (F.col("avg_processing_time") <= 7),
            "High Performer",
        )
        .when(
            (F.col("ap_avg_settlement_ratio") >= 0.8) & (F.col("avg_processing_time") <= 14),
            "Good Performer",
        )
        .when(
            (F.col("ap_avg_settlement_ratio") >= 0.7) & (F.col("avg_processing_time") <= 21),
            "Average Performer",
        )
        .otherwise("Needs Improvement")
        .alias("adjuster_performance_tier"),
        F.when(F.col("customer_state").isin("FL", "TX", "CA"), "High Risk State")
        .when(F.col("customer_state").isin("NY", "NJ", "CT"), "Medium Risk State")
        .otherwise("Low Risk State")
        .alias("state_risk_category"),
        F.when(F.col("customer_age") < 25, "Young Driver")
        .when(F.col("customer_age").between(25, 65), "Mature Driver")
        .otherwise("Senior Driver")
        .alias("customer_age_category"),
        F.lag("claim_count", 1).over(w).alias("prev_month_claims"),
        F.lag("total_claim_amount", 1).over(w).alias("prev_month_claim_amount"),
        _rdate(run_date).alias("report_date"),
    )


def gold_executive_summary(
    policies_silver: DataFrame, claims_silver: DataFrame, run_ts: str | None = None,
    run_date: str | None = None,
) -> DataFrame:
    """gold_executive_summary.sql:21-146.

    ``created_at`` mirrors the reference's CURRENT_TIMESTAMP() metadata
    column (gold_executive_summary.sql:145); like silver's processed_at it
    is populated from the injected ``run_ts`` literal when given so runs
    are deterministic (falls back to current_timestamp otherwise).
    """
    mf = (
        policies_silver.filter(F.col("invalid_premium_amount_flag") == 0)
        .groupBy(F.date_trunc("month", F.col("start_date")).alias("report_period"))
        .agg(
            F.countDistinct("policy_id").alias("new_policies"),
            F.countDistinct("customer_id").alias("active_customers"),
            F.sum("premium_amount").alias("gross_written_premium"),
            F.sum("coverage_amount").alias("total_coverage_in_force"),
            F.avg("premium_amount").alias("avg_policy_premium"),
        )
    )
    mc = (
        claims_silver.filter(F.col("missing_policy_flag") == 0)
        .groupBy(F.date_trunc("month", F.col("claim_date")).alias("report_period"))
        .agg(
            F.countDistinct("claim_id").alias("total_claims"),
            F.sum("claim_amount").alias("total_incurred_claims"),
            F.sum("settled_amount").alias("total_paid_claims"),
            F.avg("claim_amount").alias("avg_claim_severity"),
            F.count(F.when(F.col("fraud_indicator") == 1, 1)).alias("fraud_claims"),
        )
    )
    gwp0 = F.coalesce("gross_written_premium", F.lit(0))
    paid0 = F.coalesce("total_paid_claims", F.lit(0))
    claims0 = F.coalesce("total_claims", F.lit(0))
    pols0 = F.coalesce("new_policies", F.lit(0))
    kpis = mf.join(mc, "report_period", "full").select(
        "report_period",
        pols0.alias("new_policies"),
        F.coalesce("active_customers", F.lit(0)).alias("active_customers"),
        gwp0.alias("gross_written_premium"),
        F.coalesce("total_coverage_in_force", F.lit(0)).alias("total_coverage_in_force"),
        F.coalesce("avg_policy_premium", F.lit(0)).alias("avg_policy_premium"),
        claims0.alias("total_claims"),
        F.coalesce("total_incurred_claims", F.lit(0)).alias("total_incurred_claims"),
        paid0.alias("total_paid_claims"),
        F.coalesce("avg_claim_severity", F.lit(0)).alias("avg_claim_severity"),
        F.coalesce("fraud_claims", F.lit(0)).alias("fraud_claims"),
        F.when(gwp0 > 0, paid0 / F.col("gross_written_premium")).otherwise(0).alias("loss_ratio"),
        F.when(pols0 > 0, claims0.cast("double") / F.col("new_policies"))
        .otherwise(0)
        .alias("claims_frequency"),
        (gwp0 - paid0).alias("underwriting_profit"),
        F.when(claims0 > 0, F.col("fraud_claims").cast("double") / F.col("total_claims"))
        .otherwise(0)
        .alias("fraud_rate"),
    )
    w = Window.orderBy("report_period")  # post-aggregation: rows == months
    gwp_prev = F.lag("gross_written_premium", 12).over(w)
    pol_prev = F.lag("new_policies", 12).over(w)
    return kpis.select(
        "report_period",
        "new_policies",
        "active_customers",
        "total_claims",
        "gross_written_premium",
        "total_coverage_in_force",
        "total_incurred_claims",
        "total_paid_claims",
        "underwriting_profit",
        "loss_ratio",
        "claims_frequency",
        "fraud_rate",
        "avg_policy_premium",
        "avg_claim_severity",
        gwp_prev.alias("gwp_prev_year"),
        pol_prev.alias("policies_prev_year"),
        F.lag("underwriting_profit", 12).over(w).alias("profit_prev_year"),
        F.when(
            gwp_prev > 0,
            (F.col("gross_written_premium") - gwp_prev) / gwp_prev * 100,
        )
        .otherwise(0)
        .alias("gwp_growth_rate_yoy"),
        F.when(
            pol_prev > 0,
            (F.col("new_policies") - pol_prev) / pol_prev.cast("double") * 100,
        )
        .otherwise(0)
        .alias("policy_growth_rate_yoy"),
        F.when(F.col("loss_ratio") <= 0.6, "Excellent")
        .when(F.col("loss_ratio") <= 0.8, "Good")
        .when(F.col("loss_ratio") <= 1.0, "Acceptable")
        .otherwise("Concerning")
        .alias("performance_category"),
        _rdate(run_date).alias("report_date"),
        (
            F.lit(run_ts).cast("timestamp") if run_ts is not None else F.current_timestamp()
        ).alias("created_at"),
    ).orderBy(F.desc("report_period"))
