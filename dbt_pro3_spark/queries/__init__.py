"""Driver-facing query registry.

Every operator key from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, most with a DuckDB oracle SQL twin
(ANSI SQL over the same parquet tables). Keys without an oracle are the
genuinely non-SQL-expressible ops (LSH, streaming, multimodal stubs) — the
driver records a weaker rows-only check for those.

Column-name discipline: every computed/aggregate column is aliased
IDENTICALLY in the Spark code and the oracle SQL — the driver sorts columns
by name before value-hashing. Float discipline: terminal float aggregates are
rounded the same way on both sides so IEEE summation-order noise can't flip
the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def dround(expr: str, n: int) -> str:
    """DuckDB SQL for Spark-compatible ROUND(expr, n) on doubles.

    Spark's F.round on a double is BigDecimal.valueOf(x).setScale(n, HALF_UP),
    i.e. HALF_UP applied to the SHORTEST decimal representation of x. Neither
    DuckDB's round() (floating multiply, off-by-one-ulp errors) nor its direct
    double->DECIMAL cast reproduces that. Its double->VARCHAR cast *is* the
    shortest representation, and VARCHAR->DECIMAL parses with ties away from
    zero — together exactly Spark's semantics.
    """
    return f"CAST(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,{n})) AS DOUBLE)"

_LOADED = False


def register(name: str, oracle: str | None = None):
    """Decorator: register a query callable and (optionally) its oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import flagship  # noqa: F401
    from . import core_scan  # noqa: F401
    from . import core_relational  # noqa: F401
    from . import core_extra  # noqa: F401
    from . import composites  # noqa: F401
    from . import extensions  # noqa: F401
    _LOADED = True


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(QUERIES)


def all_oracle() -> dict[str, str]:
    _load_all()
    return dict(ORACLE)
