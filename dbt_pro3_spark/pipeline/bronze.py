"""Bronze layer: thin typed ingestion — CAST every column to its explicit
type, keep Auto Loader lineage columns.

Reference: models/bronze/{customers,policies,claims,premiums}_bronze.sql
(full-width CAST projections; policies also carries _rescued_data,
policies_bronze.sql:38; premiums_bronze TRIMs strings before casting,
premiums_bronze.sql:24-38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.project import typed_cast

CUSTOMERS_SPEC = {
    "customer_id": "string",
    "first_name": "string",
    "last_name": "string",
    "email": "string",
    "phone": "string",
    "date_of_birth": "date",
    "address": "string",
    "city": "string",
    "state": "string",
    "zip_code": "string",
    "annual_income": "decimal(18,2)",
    "credit_score": "int",
    "marital_status": "string",
    "occupation": "string",
    "created_at": "timestamp",
    "updated_at": "timestamp",
    "source_file_path": "string",
    "source_file_time": "timestamp",
}

POLICIES_SPEC = {
    "policy_id": "string",
    "customer_id": "string",
    "policy_type": "string",
    "coverage_amount": "decimal(18,2)",
    "premium_amount": "decimal(18,2)",
    "deductible": "decimal(18,2)",
    "start_date": "date",
    "end_date": "date",
    "status": "string",
    "agent_id": "string",
    "underwriter_id": "string",
    "payment_frequency": "string",
    "created_at": "timestamp",
    "updated_at": "timestamp",
    "_rescued_data": "string",
    "source_file_path": "string",
    "source_file_time": "timestamp",
}

CLAIMS_SPEC = {
    "claim_id": "string",
    "policy_id": "string",
    "customer_id": "string",
    "claim_date": "timestamp",
    "reported_date": "timestamp",
    "claim_amount": "double",
    "settled_amount": "double",
    "deductible_amount": "int",
    "claim_reason": "string",
    "status": "string",
    "adjuster_id": "string",
    "claim_type": "string",
    "severity": "string",
    "fraud_indicator": "int",
    "created_at": "timestamp",
    "updated_at": "timestamp",
    "source_file_path": "string",
    "source_file_time": "timestamp",
}

PREMIUMS_SPEC = {
    "premium_id": "string",
    "policy_id": "string",
    "customer_id": "string",
    "payment_date": "timestamp",
    "due_date": "timestamp",
    "premium_amount": "double",
    "payment_frequency": "string",
    "payment_method": "string",
    "payment_status": "string",
    "late_fee": "double",
    "discount_applied": "double",
    "tax_amount": "double",
    "total_amount": "double",
    "transaction_id": "string",
    "payment_processor": "string",
    "created_at": "timestamp",
    "updated_at": "timestamp",
    "source_file_path": "string",
    "source_file_time": "timestamp",
}


def customers_bronze(raw: DataFrame) -> DataFrame:
    """customers_bronze.sql:23-41."""
    return typed_cast(raw, CUSTOMERS_SPEC)


def policies_bronze(raw: DataFrame) -> DataFrame:
    """policies_bronze.sql:23-40 (incl. _rescued_data passthrough :38)."""
    return typed_cast(raw, POLICIES_SPEC)


def claims_bronze(raw: DataFrame) -> DataFrame:
    """claims_bronze.sql:22-42."""
    return typed_cast(raw, CLAIMS_SPEC)


def premiums_bronze(raw: DataFrame) -> DataFrame:
    """premiums_bronze.sql:23-45 (TRIMs strings at bronze)."""
    return typed_cast(raw, PREMIUMS_SPEC, trim_strings=True)
