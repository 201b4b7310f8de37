from .scalar import (
    age_years,
    clamp_nonneg,
    cond_count,
    cond_sum,
    full_name,
    not_matching,
    null_or_empty,
    safe_div,
    month_bucket,
)

__all__ = [
    "age_years",
    "clamp_nonneg",
    "cond_count",
    "cond_sum",
    "full_name",
    "not_matching",
    "null_or_empty",
    "safe_div",
    "month_bucket",
]
