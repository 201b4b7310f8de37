"""The main correctness gate: every registered query with an oracle must
match DuckDB at sf0.01 — same check shape as the driver's CORRECTNESS run."""

from __future__ import annotations

import pytest

from dbt_pro3_spark.queries import all_oracle, all_queries

from .conftest import SF_DIR
from .parity import compare

_QUERIES = all_queries()
_ORACLE = all_oracle()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_parity(spark, duck, name):
    df = _QUERIES[name](spark, SF_DIR)
    errs = compare(df, duck, _ORACLE[name], name)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLE)))
def test_rows_only(spark, name):
    """Queries without an oracle still must run and return a stable schema."""
    df = _QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0
