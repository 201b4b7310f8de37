"""Fuzz the rounding bridge: Spark F.round(double, n) must equal the
oracle-side dround() (VARCHAR->DECIMAL->DOUBLE) for ALL doubles — every
float-keyed oracle in the registry leans on this equivalence, so it gets
its own adversarial + property-based test."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_pro3_spark.queries import dround

# classic half-up boundary cases the two engines disagree on with naive
# round(): shortest-repr x.xx5 values, ulp-below/above boundaries, negatives
ADVERSARIAL = [
    0.005, 0.015, 0.025, 0.125, 1.005, 2.675, 17.005, -0.005, -2.675,
    0.1 + 0.2, 1e15 + 0.5, 123456789.004999999, 4.9999999999, -4.9999999999,
    0.0, -0.0, 1e-9, -1e-9, 99999.995, 99999.994999999,
]


def _check(spark, values: list[float], n: int) -> None:
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    got = [r["y"] for r in df.selectExpr(f"round(x, {n}) AS y").collect()]
    con = duckdb.connect()
    # inject via VARCHAR -> DOUBLE (strtod, exact round-trip): a plain
    # decimal literal would be parsed as DECIMAL and DuckDB's
    # DECIMAL -> DOUBLE conversion is not correctly rounded, silently
    # handing the oracle a DIFFERENT double than Spark got
    exp = []
    for v in values:
        lit = "CAST('" + repr(float(v)) + "' AS DOUBLE)"
        exp.append(con.execute("SELECT " + dround(lit, n)).fetchone()[0])
    for v, g, e in zip(values, got, exp):
        assert g == e or (g != g and e != e), f"round({v!r}, {n}): spark={g!r} duck={e!r}"


@pytest.mark.parametrize("n", [2, 6])
def test_round_adversarial(spark, n):
    _check(spark, ADVERSARIAL, n)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    )
)
def test_round_property(spark, xs):
    _check(spark, xs, 2)
    _check(spark, xs, 6)
