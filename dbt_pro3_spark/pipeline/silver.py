"""Silver layer: standardize strings, derive business columns, attach
quality flags, dedup by PK latest-wins.

Faithful re-expressions of models/silver/*.sql — including the quirks:
- flags are computed on the PRE-clean input columns (the reference's CASEs
  reference bronze columns, not the trimmed aliases);
- full_name uses CONCAT (null-propagating), not concat_ws
  (customers_silver.sql:47);
- age is year subtraction guarded by dob IS NOT NULL
  (customers_silver.sql:44-46);
- processed_at is an injected run_ts literal instead of
  CURRENT_TIMESTAMP() so the dedup tiebreaker is deterministic
  (SURVEY §7 hazard 1 — within one query current_timestamp is constant, so
  the reference's tiebreaker was a no-op anyway);
- premiums dedups FIRST (on source_file_time DESC) and cleans after
  (premiums_silver.sql:25-76), unlike the other three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import EMAIL_RE
from ..operators.windows import dedup_latest


def _flag(cond) -> F.Column:
    return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("int")


def customers_silver(
    bronze: DataFrame, run_ts: str, run_date: str | None = None
) -> DataFrame:
    """customers_silver.sql:21-91.

    ``age`` mirrors the reference's YEAR(CURRENT_DATE) - YEAR(dob)
    (customers_silver.sql:52); when ``run_date`` is injected the run date's
    year is used instead so deterministic runs don't roll over at new year.
    """
    c = bronze
    cleaned = c.select(
        F.trim("customer_id").cast("string").alias("customer_id"),
        F.initcap(F.trim("first_name")).alias("first_name"),
        F.initcap(F.trim("last_name")).alias("last_name"),
        F.lower(F.trim("email")).alias("email"),
        F.trim("phone").alias("phone"),
        F.col("date_of_birth").cast("date").alias("date_of_birth"),
        F.trim("address").alias("address"),
        F.trim("city").alias("city"),
        F.trim("state").alias("state"),
        F.trim("zip_code").alias("zip_code"),
        F.col("annual_income").cast("decimal(18,2)").alias("annual_income"),
        F.col("credit_score").cast("int").alias("credit_score"),
        F.initcap(F.trim("marital_status")).alias("marital_status"),
        F.initcap(F.trim("occupation")).alias("occupation"),
        F.col("created_at").cast("timestamp").alias("created_at"),
        F.col("updated_at").cast("timestamp").alias("updated_at"),
        "source_file_path",
        "source_file_time",
        F.lit(run_ts).cast("timestamp").alias("processed_at"),
        F.when(
            F.col("date_of_birth").isNotNull(),
            F.year(
                F.lit(run_date).cast("date") if run_date is not None
                else F.current_date()
            ) - F.year("date_of_birth"),
        ).alias("age"),
        # CONCAT, not concat_ws: NULL name => NULL full_name (sql:47)
        F.concat(
            F.initcap(F.trim("first_name")), F.lit(" "), F.initcap(F.trim("last_name"))
        ).alias("full_name"),
        _flag(F.col("customer_id").isNull() | (F.col("customer_id") == "")).alias(
            "missing_id_flag"
        ),
        _flag(F.col("email").isNull() | ~F.col("email").rlike(EMAIL_RE)).alias(
            "invalid_email_flag"
        ),
    )
    deduped = dedup_latest(
        cleaned.filter(F.col("missing_id_flag") == 0),
        keys=["customer_id"],
        order_desc=["updated_at", "processed_at"],
    )
    return deduped.select(
        "customer_id", "first_name", "last_name", "full_name", "email", "phone",
        "date_of_birth", "age", "address", "city", "state", "zip_code",
        "annual_income", "credit_score", "marital_status", "occupation",
        "created_at", "updated_at", "source_file_path", "source_file_time",
        "processed_at", "invalid_email_flag",
    )


def policies_silver(bronze: DataFrame, run_ts: str) -> DataFrame:
    """policies_silver.sql:22-91."""
    p = bronze
    cleaned = p.select(
        F.trim("policy_id").cast("string").alias("policy_id"),
        F.trim("customer_id").cast("string").alias("customer_id"),
        F.initcap(F.trim("policy_type")).alias("policy_type"),
        F.col("coverage_amount").cast("decimal(18,2)").alias("coverage_amount"),
        F.col("premium_amount").cast("decimal(18,2)").alias("premium_amount"),
        F.col("deductible").cast("decimal(18,2)").alias("deductible"),
        F.col("start_date").cast("date").alias("start_date"),
        F.col("end_date").cast("date").alias("end_date"),
        F.upper(F.trim("status")).alias("status"),
        F.col("agent_id").cast("string").alias("agent_id"),
        F.col("underwriter_id").cast("string").alias("underwriter_id"),
        F.lower(F.trim("payment_frequency")).alias("payment_frequency"),
        F.col("created_at").cast("timestamp").alias("created_at"),
        F.col("updated_at").cast("timestamp").alias("updated_at"),
        "source_file_path",
        "source_file_time",
        F.lit(run_ts).cast("timestamp").alias("processed_at"),
        _flag(F.col("policy_id").isNull() | (F.col("policy_id") == "")).alias(
            "missing_policy_id_flag"
        ),
        _flag(F.col("customer_id").isNull() | (F.col("customer_id") == "")).alias(
            "missing_customer_id_flag"
        ),
        _flag(F.col("coverage_amount").isNull() | (F.col("coverage_amount") < 0)).alias(
            "invalid_coverage_amount_flag"
        ),
        _flag(F.col("premium_amount").isNull() | (F.col("premium_amount") < 0)).alias(
            "invalid_premium_amount_flag"
        ),
        _flag(F.col("deductible").isNull() | (F.col("deductible") < 0)).alias(
            "invalid_deductible_flag"
        ),
        _flag(
            F.col("start_date").isNull()
            | F.col("end_date").isNull()
            | (F.col("start_date") > F.col("end_date"))
        ).alias("invalid_date_range_flag"),
        F.datediff("end_date", "start_date").alias("policy_duration_days"),
    )
    deduped = dedup_latest(
        cleaned.filter(F.col("missing_policy_id_flag") == 0),
        keys=["policy_id"],
        order_desc=["updated_at", "processed_at"],
    )
    return deduped.select(
        "policy_id", "customer_id", "policy_type", "coverage_amount", "premium_amount",
        "deductible", "start_date", "end_date", "status", "agent_id", "underwriter_id",
        "payment_frequency", "created_at", "updated_at", "source_file_path",
        "source_file_time", "processed_at", "policy_duration_days",
        "missing_customer_id_flag", "invalid_coverage_amount_flag",
        "invalid_premium_amount_flag", "invalid_deductible_flag",
        "invalid_date_range_flag",
    )


def claims_silver(bronze: DataFrame, run_ts: str) -> DataFrame:
    """claims_silver.sql:19-89."""
    cl = bronze
    cleaned = cl.select(
        F.trim("claim_id").cast("string").alias("claim_id"),
        F.trim("policy_id").cast("string").alias("policy_id"),
        F.trim("customer_id").cast("string").alias("customer_id"),
        F.col("claim_date").cast("timestamp").alias("claim_date"),
        F.col("reported_date").cast("timestamp").alias("reported_date"),
        F.col("claim_amount").cast("double").alias("claim_amount"),
        F.col("settled_amount").cast("double").alias("settled_amount"),
        F.col("deductible_amount").cast("int").alias("deductible_amount"),
        F.initcap(F.trim("claim_reason")).alias("claim_reason"),
        F.upper(F.trim("status")).alias("status"),
        F.col("adjuster_id").cast("string").alias("adjuster_id"),
        F.upper(F.trim("claim_type")).alias("claim_type"),
        F.upper(F.trim("severity")).alias("severity"),
        F.col("fraud_indicator").cast("int").alias("fraud_indicator"),
        F.col("created_at").cast("timestamp").alias("created_at"),
        F.col("updated_at").cast("timestamp").alias("updated_at"),
        "source_file_path",
        "source_file_time",
        F.lit(run_ts).cast("timestamp").alias("processed_at"),
        _flag(F.col("claim_id").isNull() | (F.col("claim_id") == "")).alias("missing_id_flag"),
        _flag(F.col("policy_id").isNull() | (F.col("policy_id") == "")).alias(
            "missing_policy_flag"
        ),
        _flag(F.col("customer_id").isNull() | (F.col("customer_id") == "")).alias(
            "missing_customer_flag"
        ),
        _flag(F.col("claim_amount").isNull() | (F.col("claim_amount") < 0)).alias(
            "invalid_claim_amount_flag"
        ),
        _flag(F.col("settled_amount").isNull() | (F.col("settled_amount") < 0)).alias(
            "invalid_settled_amount_flag"
        ),
    )
    deduped = dedup_latest(
        cleaned.filter(F.col("missing_id_flag") == 0),
        keys=["claim_id"],
        order_desc=["updated_at", "processed_at"],
    )
    return deduped.select(
        "claim_id", "policy_id", "customer_id", "claim_date", "reported_date",
        "claim_amount", "settled_amount", "deductible_amount", "claim_reason",
        "status", "adjuster_id", "claim_type", "severity", "fraud_indicator",
        "created_at", "updated_at", "source_file_path", "source_file_time",
        "processed_at",
        F.datediff("reported_date", "claim_date").alias("reporting_delay_days"),
        (F.col("claim_amount") - F.col("settled_amount")).alias("claim_difference"),
        F.when(
            F.col("claim_amount") > 0,
            F.round(F.col("settled_amount") / F.col("claim_amount"), 3),
        ).alias("settlement_ratio"),
        "missing_policy_flag", "missing_customer_flag",
        "invalid_claim_amount_flag", "invalid_settled_amount_flag",
    )


def premiums_silver(bronze: DataFrame, run_ts: str) -> DataFrame:  # noqa: ARG001
    """premiums_silver.sql:20-78 — dedup FIRST (source_file_time DESC), then
    clamp negatives and normalize case."""
    deduped = dedup_latest(bronze, keys=["premium_id"], order_desc=["source_file_time"])
    clamp = lambda c: F.when(F.col(c) < 0, F.lit(0.0)).otherwise(F.col(c))  # noqa: E731
    return deduped.select(
        "premium_id", "policy_id", "customer_id", "payment_date", "due_date",
        clamp("premium_amount").alias("premium_amount"),
        F.upper(F.trim("payment_frequency")).alias("payment_frequency"),
        F.initcap(F.trim("payment_method")).alias("payment_method"),
        F.upper(F.trim("payment_status")).alias("payment_status"),
        clamp("late_fee").alias("late_fee"),
        clamp("discount_applied").alias("discount_applied"),
        clamp("tax_amount").alias("tax_amount"),
        clamp("total_amount").alias("total_amount"),
        "transaction_id",
        F.initcap(F.trim("payment_processor")).alias("payment_processor"),
        "created_at", "updated_at", "source_file_path", "source_file_time",
    )
