"""Scalar expression helpers mirroring the reference's SQL function surface.

Each helper preserves the reference's exact semantics (SURVEY.md §2.B/2.C),
including its quirks — e.g. age is plain year subtraction, not a true age
(customers_silver.sql:44-46). All are Column-in/Column-out so they stay
inside Catalyst/whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"^[A-Za-z0-9+_.-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def null_or_empty(c: Column) -> Column:
    """``col IS NULL OR col = ''`` missing-key predicate
    (customers_silver.sql:49)."""
    return c.isNull() | (c == F.lit(""))


def not_matching(c: Column, pattern: str) -> Column:
    """``col NOT RLIKE pattern`` (invalid-email check,
    customers_silver.sql:50-53)."""
    return ~c.rlike(pattern)


def flag(cond: Column) -> Column:
    """0/1 INT data-quality flag column (customers_silver.sql:49-53)."""
    return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("int")


def age_years(dob: Column) -> Column:
    """Reference 'age': YEAR(CURRENT_DATE) - YEAR(dob) — year subtraction,
    deliberately NOT floored exact age (customers_silver.sql:44-46)."""
    return F.year(F.current_date()) - F.year(dob)


def full_name(first: Column, last: Column) -> Column:
    """CONCAT(first, ' ', last) (customers_silver.sql:47).

    Uses F.concat, NOT concat_ws: the reference's CONCAT null-propagates
    (NULL last_name -> NULL full_name), while concat_ws would silently skip
    NULLs and return 'First'. pipeline/silver.py relies on the same
    semantics.
    """
    return F.concat(first, F.lit(" "), last)


def month_bucket(c: Column) -> Column:
    """DATE_TRUNC('month', col) as a DATE.

    The reference's Databricks date_trunc returns timestamp
    (gold_executive_summary.sql:23); we cast to date so monthly keys are
    compact and oracle-stable (DuckDB's date_trunc('month') returns DATE).
    """
    return F.date_trunc("month", c).cast("date")


def safe_div(num: Column, den: Column, scale: int | None = None) -> Column:
    """Divide-by-zero guard ``num / NULLIF(den, 0)``
    (gold_policy_performance.sql:103-105). Both sides cast to double first —
    the reference's own CAST(... AS DOUBLE) habit (gold_customer_360.sql:114).
    """
    out = num.cast("double") / F.nullif(den.cast("double"), F.lit(0).cast("double"))
    return F.round(out, scale) if scale is not None else out


def clamp_nonneg(c: Column) -> Column:
    """CASE WHEN amt < 0 THEN 0 ELSE amt END negative clamp
    (premiums_silver.sql:60,64-67)."""
    return F.when(c < 0, F.lit(0)).otherwise(c)


def cond_count(cond: Column) -> Column:
    """COUNT(CASE WHEN cond THEN 1 END) — counts only matching rows; the
    NULL else-branch is what makes COUNT skip them (gold_customer_360.sql:46).
    """
    return F.count(F.when(cond, F.lit(1)))


def cond_sum(cond: Column) -> Column:
    """SUM(CASE WHEN cond THEN 1 ELSE 0 END)
    (gold_claims_operations.sql:53)."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
