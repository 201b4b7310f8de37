"""Error-bound verification for the sketch-based approximate operators.

Since round 3 these keys are hash-checked by the driver: their outputs are
exact values plus bounded-relative-error invariant FLAGS (the sketch's
guarantee made a column the oracle pins TRUE). These tests verify the flags
actually hold AND independently recompute the raw estimates against their
advertised bounds, so a broken sketch fails here with the raw numbers in
the message — not just as a flipped boolean.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_pro3_spark.queries import all_queries

SF = "/root/testdata/sf0.01"


def test_approx_distinct_error_bound(spark):
    from dbt_pro3_spark.sources.readers import load

    rows = all_queries()["ext_approx_distinct"](spark, SF).collect()
    assert rows and all(r["approx_within_5pct"] for r in rows), rows
    exact = {
        r["event_type"]: r["exact"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    # the emitted exact_users must be the true exact counts
    assert {r["event_type"]: r["exact_users"] for r in rows} == exact
    # raw estimate independently recomputed against the 5-sigma bound
    approx = {
        r["event_type"]: r["a"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("a"))
        .collect()
    }
    for k, a in approx.items():
        rel = abs(a - exact[k]) / exact[k]
        assert rel <= 0.05, f"{k}: approx {a} vs exact {exact[k]} (rel {rel:.3f})"


def test_approx_quantile_error_bound(spark):
    from dbt_pro3_spark.sources.readers import load

    rows = all_queries()["ext_approx_quantile"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["p50_ok"] and r["p95_ok"] and r["p99_ok"], r
    # raw estimates recomputed against a 2% value tolerance
    est = {
        r["o_orderpriority"]: r["apx"]
        for r in load(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.5, 0.95, 0.99], 1000
            ).alias("apx")
        )
        .collect()
    }
    exact_rows = (
        load(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, array(0.5, 0.95, 0.99))").alias("pct"))
        .collect()
    )
    for r in exact_rows:
        for i, (a, e) in enumerate(zip(est[r["o_orderpriority"]], r["pct"])):
            assert abs(a - e) / e <= 0.02, (r["o_orderpriority"], i, a, e)


def test_sketch_merge_error_bound(spark):
    """Per-group flags AND the merged __ALL__ flag must hold, and the
    emitted exact counts must be the true distincts — merging sketches must
    not lose accuracy vs sketching the union directly."""
    from dbt_pro3_spark.sources.readers import load

    rows = all_queries()["ext_sketch_merge"](spark, SF).collect()
    assert all(r["approx_within_5pct"] for r in rows), rows
    ev = load(spark, SF, "events")
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    exact["__ALL__"] = ev.select("user_id").distinct().count()
    assert {r["event_type"]: r["exact_users"] for r in rows} == exact


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
