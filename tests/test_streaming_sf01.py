"""Streaming eviction oracles at sf0.1 — 10x the data the default suite uses.

The availableNow streaming keys encode watermark-eviction inequalities in
their oracles (window_end <= w, session horizon < w, ...). Those boundaries
are validated empirically, so a 10x-denser event stream is the cheapest way
to catch boundary drift before the driver does (VERDICT r02 next-step #8).

Marked via SPARK_GRAFT_SF01_STREAM=0 to skip (each key pays a real
streaming run at sf0.1; the whole module is ~2-3 min).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from dbt_pro3_spark.queries import all_oracle, all_queries

from .parity import compare

SF01 = "/root/testdata/sf0.1"

STREAM_KEYS = [
    "ext_watermark_stream",
    "ext_stream_stream_join",
    "ext_stream_outer_join",
    "ext_stream_dedup",
    "ext_stream_static_join",
    "ext_stream_session_timeout",
    "ext_stream_foreachbatch_merge",
]

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF01_STREAM", "1") == "0"
    or not os.path.isdir(SF01),
    reason="sf0.1 streaming pass disabled or data missing",
)


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", STREAM_KEYS)
def test_stream_oracle_sf01(spark, duck01, name):
    queries, oracle = all_queries(), all_oracle()
    df = queries[name](spark, SF01)
    assert name in oracle, f"{name} lost its oracle"
    errs = compare(df, duck01, oracle[name], name)
    assert not errs, "\n".join(errs)
