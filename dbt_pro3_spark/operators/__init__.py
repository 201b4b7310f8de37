from .project import typed_cast
from .quality import dq_flags, test_not_null, test_unique
from .windows import dedup_latest, lag_over

__all__ = [
    "typed_cast",
    "dq_flags",
    "test_not_null",
    "test_unique",
    "dedup_latest",
    "lag_over",
]
