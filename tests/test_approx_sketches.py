"""Error-bound verification for the sketch-based approximate operators.

These keys are rows-only in the driver's oracle check (HLL++/GK sketches
aren't replicable in DuckDB); THIS is their correctness evidence — the
approximation must land within its advertised bound of the exact answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_pro3_spark.queries import all_queries

SF = "/root/testdata/sf0.01"


def test_approx_distinct_error_bound(spark):
    got = {
        r["event_type"]: r["approx_users"]
        for r in all_queries()["ext_approx_distinct"](spark, SF).collect()
    }
    from dbt_pro3_spark.sources.readers import load

    exact = {
        r["event_type"]: r["exact"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, approx in got.items():
        rel = abs(approx - exact[k]) / exact[k]
        # rsd 1% => 5 sigma headroom; deterministic given the data
        assert rel <= 0.05, f"{k}: approx {approx} vs exact {exact[k]} (rel {rel:.3f})"


def test_approx_quantile_error_bound(spark):
    from dbt_pro3_spark.sources.readers import load

    got = {
        r["o_orderpriority"]: (r["p50"], r["p95"], r["p99"])
        for r in all_queries()["ext_approx_quantile"](spark, SF).collect()
    }
    exact_rows = (
        load(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, array(0.5, 0.95, 0.99))").alias("pct"))
        .collect()
    )
    for r in exact_rows:
        for i, (a, e) in enumerate(zip(got[r["o_orderpriority"]], r["pct"])):
            # GK accuracy 1000 => rank error <= n/1000; translate loosely to
            # a 2% value tolerance on this smooth distribution
            assert abs(a - e) / e <= 0.02, (r["o_orderpriority"], i, a, e)


def test_sketch_merge_error_bound(spark):
    """Per-group estimates AND the merged global estimate must land within
    5% of the exact distinct counts — merging sketches must not lose
    accuracy vs sketching the union directly."""
    from dbt_pro3_spark.sources.readers import load

    got = {
        r["event_type"]: r["approx_users"]
        for r in all_queries()["ext_sketch_merge"](spark, SF).collect()
    }
    ev = load(spark, SF, "events")
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    exact["__ALL__"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, approx in got.items():
        rel = abs(approx - exact[k]) / exact[k]
        assert rel <= 0.05, f"{k}: approx {approx} vs exact {exact[k]}"


def test_countmin_error_bound(spark):
    """CMS guarantees: one-sided error (est >= exact always) and, with the
    d=3 x w=256 grid, expected overcount ~ N/w per probe — assert the
    deterministic outcome stays under 4x that expectation for every
    reported heavy hitter."""
    from dbt_pro3_spark.queries.llm_ops import CMS_W
    from dbt_pro3_spark.sources.readers import load

    rows = all_queries()["ext_sketch_countmin"](spark, SF).collect()
    assert len(rows) == 20
    n_events = load(spark, SF, "events").count()
    bound = 4.0 * n_events / CMS_W
    for r in rows:
        assert r["overcount"] >= 0, r  # never undercounts
        assert r["cms_est"] == r["exact_n"] + r["overcount"]
        assert r["overcount"] <= bound, (r, bound)
