"""Semantic unit tests for queries/scale_ops.py — known-answer fixtures
that pin each operator's contract independently of the DuckDB oracle (the
oracle proves Spark==DuckDB; these prove both equal the intended math)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_pro3_spark.queries import all_queries
from dbt_pro3_spark.sources.readers import load

from .conftest import SF_DIR

_Q = all_queries()


def test_triangles_known_graph(spark):
    """K4 plus a pendant edge: C(4,3)=4 triangles; each K4 vertex is in 3,
    the pendant vertex in 0 — verified with the same degree-oriented logic
    the registered key uses, applied to a hand-built edge list."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)], ["a", "b"]
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    rk = deg.select("v", F.row_number().over(Window.orderBy("d", "v")).alias("rk"))
    er = (
        edges.join(rk.withColumnRenamed("v", "a").withColumnRenamed("rk", "rka"), "a")
        .join(rk.withColumnRenamed("v", "b").withColumnRenamed("rk", "rkb"), "b")
        .select(F.least("rka", "rkb").alias("src"), F.greatest("rka", "rkb").alias("dst"))
    )
    wedges = (
        er.select("src", F.col("dst").alias("d1"))
        .join(er.select("src", F.col("dst").alias("d2")), "src")
        .filter(F.col("d1") < F.col("d2"))
    )
    closed = wedges.join(
        er.select(F.col("src").alias("d1"), F.col("dst").alias("d2")), ["d1", "d2"]
    )
    assert closed.count() == 4  # triangles in K4

    # and the registered key agrees with its own oracle-checked shape: the
    # per-vertex totals must sum to 3 * total triangles
    out = _Q["ext_graph_triangles"](spark, SF_DIR)
    agg = out.agg(F.sum("n_triangles").alias("s")).collect()[0]
    assert agg["s"] % 3 == 0 and agg["s"] > 0


def test_cdc_apply_drops_tombstoned_entities(spark):
    """Entities whose HIGHEST-seq op is a delete must be absent; every
    surviving entity's last_op is the op of its max orderkey."""
    out = _Q["ext_cdc_apply"](spark, SF_DIR)
    rows = out.collect()
    assert all(r["last_op"] in ("I", "U") for r in rows)
    orders = load(spark, SF_DIR, "orders")
    n_entities = orders.select(
        (F.col("o_orderkey") % 1000).alias("e")
    ).distinct().count()
    # some entities end in 'D' (md5 spreads ~10% of keys onto the tombstone
    # branch), so output must be strictly smaller than the entity universe
    assert 0 < out.count() < n_entities


def test_two_phase_agg_equals_plain_groupby(spark):
    plain = (
        load(spark, SF_DIR, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )
    two = _Q["ext_agg_skew_twophase"](spark, SF_DIR)
    assert two.exceptAll(plain).count() == 0 and plain.exceptAll(two).count() == 0


def test_time_interpolate_no_gaps_and_locf(spark):
    out = _Q["ext_time_interpolate"](spark, SF_DIR)
    # spine density: per user, row count == span days (no calendar holes)
    span = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("expect"),
    )
    assert span.filter(F.col("n") != F.col("expect")).count() == 0
    # LOCF: filled values never null (first spine day is always observed)
    assert out.filter(F.col("filled_v").isNull()).count() == 0
    # carried rows must repeat the previous value
    w = Window.partitionBy("user_id").orderBy("day")
    carried = out.withColumn("prev", F.lag("filled_v").over(w)).filter(
        ~F.col("was_observed")
    )
    assert carried.filter(F.col("filled_v") != F.col("prev")).count() == 0


def test_quantile_cut_keeps_top_half_per_source(spark):
    out = _Q["ext_quality_quantile_cut"](spark, SF_DIR)
    docs = load(spark, SF_DIR, "documents")
    pop = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_all"))
    kept = out.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    j = pop.join(kept, "source").collect()
    for r in j:
        # percent_rank <= 0.5 keeps ceil((n-1)/2)+1 rows of n
        assert r["n_kept"] == (r["n_all"] - 1) // 2 + 1


def test_ccnet_buckets_are_balanced_tertiles(spark):
    out = _Q["ext_ccnet_bucket"](spark, SF_DIR)
    sizes = out.groupBy("lang", "tertile").agg(F.count(F.lit(1)).alias("n"))
    spread = sizes.groupBy("lang").agg(
        (F.max("n") - F.min("n")).alias("d"), F.count(F.lit(1)).alias("k")
    )
    rows = spread.collect()
    assert all(r["k"] == 3 and r["d"] <= 1 for r in rows)  # NTILE balance


def test_kanon_suppress_matches_class_size(spark):
    out = _Q["ext_privacy_kanon"](spark, SF_DIR)
    bad = out.filter(
        (F.col("suppress") & (F.col("class_size") >= 5))
        | (~F.col("suppress") & (F.col("class_size") < 5))
    )
    assert bad.count() == 0


def test_mode_moments_sanity(spark):
    out = _Q["agg_mode_moments"](spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        assert r["m2"] > 0
        # value ~ uniform-ish positive distribution: kurtosis of any real
        # distribution >= skewness^2 - 2 (Pearson inequality)
        assert r["excess_kurtosis"] + 3 >= r["skewness"] ** 2 - 2 + 1e-9


def test_prefix_dup_groups_consistent(spark):
    out = _Q["ext_text_prefix_dup"](spark, SF_DIR)
    chk = out.groupBy("prefix", "group_size").agg(F.count(F.lit(1)).alias("n"))
    assert chk.filter(F.col("n") != F.col("group_size")).count() == 0


def test_embed_norm_stats_bounds(spark):
    out = _Q["ext_embed_norm_stats"](spark, SF_DIR).collect()
    for r in out:
        assert 0 < r["min_norm"] <= r["avg_norm"] <= r["max_norm"]


def test_zipf_slope_negative(spark):
    r = _Q["ext_text_zipf"](spark, SF_DIR).collect()[0]
    assert r["zipf_slope"] < 0  # frequency falls with rank, by construction
    assert -1 <= r["zipf_corr"] < 0


def test_prefix_filter_recall_is_exactly_one(spark):
    """Brute-force all-pairs Jaccard at sf0.001 must equal the prefix-filter
    output exactly — the pigeonhole guarantee, verified end-to-end."""
    from dbt_pro3_spark.ext import dedup as ded
    from dbt_pro3_spark.ext.text import shingles

    from .conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents")
    got = ded.prefix_filter_pairs(docs, "doc_id", "text", n=3, threshold=0.5)

    sh = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(shingles(F.col("text"), 3)).alias("shingle"),
    ).distinct()
    sized = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col("doc").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc").alias("doc_b"), "shingle")
    common = (
        sa.join(sb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common_shingles"))
    )
    za = sized.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sized.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    brute = (
        common.join(za, "doc_a")
        .join(zb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common_shingles").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common_shingles")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "common_shingles", "jaccard")
    )
    assert got.exceptAll(brute).count() == 0
    assert brute.exceptAll(got).count() == 0


def test_ab_ztest_matches_python_recompute(spark):
    import math

    out = {r["event_type"]: r for r in _Q["ext_ab_ztest"](spark, SF_DIR).collect()}
    raw = (
        load(spark, SF_DIR, "events")
        .select("event_type", (F.col("user_id") % 2).alias("v"), "value")
        .collect()
    )
    groups: dict = {}
    for r in raw:
        groups.setdefault((r["event_type"], r["v"]), []).append(r["value"])
    for et, row in out.items():
        a, b = groups[(et, 0)], groups[(et, 1)]
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((x - ma) ** 2 for x in a) / len(a)
        vb = sum((x - mb) ** 2 for x in b) / len(b)
        z = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        assert abs(row["z_stat"] - z) < 1e-3, f"{et}: {row['z_stat']} vs {z}"


def test_containment_bounds_and_threshold(spark):
    rows = _Q["ext_dedup_containment"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.7 - 1e-9 <= r["containment"] <= 1.0 + 1e-9


def test_rolling_median_single_user_recompute(spark):
    import statistics

    ev = (
        load(spark, SF_DIR, "events")
        .filter(F.col("user_id") == 1)
        .select("event_id", "ts", "value")
        .collect()
    )
    ev.sort(key=lambda r: (r["ts"], r["event_id"]))
    got = {
        r["event_id"]: r["rolling_median"]
        for r in _Q["ext_win_rolling_median"](spark, SF_DIR)
        .filter(F.col("user_id") == 1)
        .collect()
    }
    for i, r in enumerate(ev):
        window = [x["value"] for x in ev[max(0, i - 6) : i + 1]]
        assert abs(got[r["event_id"]] - statistics.median(window)) < 1e-5


def test_interval_overlap_is_positive_and_bounded(spark):
    out = _Q["ext_interval_overlap_join"](spark, SF_DIR)
    rows = out.collect()
    assert rows
    for r in rows:
        # windows are 1-3 hours; a session-day is <= 24h -> overlap bounded
        assert 0 < r["overlap_us"] <= 3 * 3600 * 1_000_000


def test_dup_span_remove_token_conservation(spark):
    """clean_text token count must equal n_tokens - n_removed for every
    document, removals are non-negative and bounded, and the corpus's
    planted duplication means SOMETHING gets removed."""
    rows = _Q["ext_text_dup_span_remove"](spark, SF_DIR).collect()
    assert rows
    total_removed = 0
    for r in rows:
        assert 0 <= r["n_removed"] <= r["n_tokens"]
        kept = [t for t in r["clean_text"].split(" ") if t] if r["clean_text"] else []
        assert len(kept) == r["n_tokens"] - r["n_removed"]
        total_removed += r["n_removed"]
    assert total_removed > 0


def test_dsir_target_slice_ranks_higher(spark):
    """The DSIR weight is a target-vs-raw log-likelihood ratio with the
    'en' slice as target, so en documents must average a higher weight
    than non-en documents (the KL(target||raw) direction is positive)."""
    out = _Q["ext_dsir_resample"](spark, SF_DIR)
    docs = load(spark, SF_DIR, "documents").select("doc_id", "lang")
    j = out.join(docs, "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_logw").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_token_budget_plan_invariants(spark):
    """Shares sum to 1, allocations sum to ~budget, epochs math is
    consistent, and alpha < 1 upweights the smallest source relative to
    its raw token share."""
    from dbt_pro3_spark.queries.scale_ops import MIX_BUDGET

    rows = _Q["ext_token_budget_plan"](spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r["p_sample"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["alloc_tokens"] for r in rows) - MIX_BUDGET) <= len(rows)
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert abs(r["epochs"] - MIX_BUDGET * r["p_sample"] / r["n_tokens"]) < 1e-5
    lo = min(rows, key=lambda r: r["n_tokens"])
    hi = max(rows, key=lambda r: r["n_tokens"])
    assert lo["p_sample"] / (lo["n_tokens"] / total) > hi["p_sample"] / (hi["n_tokens"] / total)


def test_embed_whiten_centers_and_scales(spark):
    """Whitened coordinates must be ~zero-mean, ~unit-std per dimension
    (up to the 6dp rounding of the broadcast stats)."""
    import statistics

    rows = _Q["ext_embed_whiten"](spark, SF_DIR).collect()
    assert rows
    dim = len(rows[0]["whitened"])
    for d in range(0, dim, 7):  # spot-check every 7th dimension
        xs = [r["whitened"][d] for r in rows]
        assert abs(statistics.fmean(xs)) < 1e-3
        assert abs(statistics.pstdev(xs) - 1.0) < 0.01


def test_source_overlap_all_pairs_bounded(spark):
    """Every unordered source pair appears at most once; similarity
    coefficients are bounded and consistent (containment >= jaccard,
    shared <= min side)."""
    rows = _Q["ext_source_overlap"](spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))
        assert 0 < r["shared"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["containment"] >= r["jaccard"]


def test_chunk_fuzzy_pairs_are_cross_doc(spark):
    """Chunk pairs must span two distinct documents, with the doc ids
    recoverable from the chunk ids and a valid verified Jaccard."""
    from dbt_pro3_spark.queries.scale_ops import CHUNK_ID_BASE

    rows = _Q["ext_dedup_chunk_fuzzy"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] == r["chunk_a"] // CHUNK_ID_BASE
        assert r["doc_b"] == r["chunk_b"] // CHUNK_ID_BASE
        assert r["doc_a"] != r["doc_b"]
        assert r["common_shingles"] >= 1
        assert 0.0 < r["jaccard"] <= 1.0


def test_drift_psi_recompute(spark):
    """PSI recomputed in Python from the emitted bin counts must match
    psi_total, and per-bin contributions must sum to the total."""
    import math

    rows = _Q["ext_drift_psi"](spark, SF_DIR).collect()
    assert rows
    tr = sum(r["n_ref"] for r in rows)
    tc = sum(r["n_cur"] for r in rows)
    psi = 0.0
    for r in rows:
        pr = (r["n_ref"] + 1.0) / (tr + 32.0)
        pc = (r["n_cur"] + 1.0) / (tc + 32.0)
        psi += (pr - pc) * math.log(pr / pc)
        assert abs(r["p_ref"] - pr) < 1e-5 and abs(r["p_cur"] - pc) < 1e-5
    totals = {r["psi_total"] for r in rows}
    assert len(totals) == 1
    total = totals.pop()
    assert abs(total - psi) < 1e-5
    assert abs(sum(r["psi_bin"] for r in rows) - total) < 1e-4


def test_vocab_coverage_monotone_and_complete(spark):
    """Coverage must be monotonically non-decreasing in K, end at 1.0 once
    K clamps to the full vocabulary, and match a Python recompute."""
    from collections import Counter

    rows = sorted(
        _Q["ext_text_vocab_coverage"](spark, SF_DIR).collect(), key=lambda r: r["k"]
    )
    assert rows
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs)
    docs = load(spark, SF_DIR, "documents").select("text").collect()
    cnt = Counter(t for r in docs for t in r["text"].split(" ") if t)
    total = sum(cnt.values())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    for r in rows:
        at = min(r["k"], len(ranked))
        assert r["at_rank"] == at
        expected = sum(c for _, c in ranked[:at])
        assert r["covered_tokens"] == expected
        assert abs(r["coverage"] - expected / total) < 1e-5
    if rows[-1]["k"] >= len(ranked):
        assert rows[-1]["coverage"] == 1.0


def test_eval_confusion_recompute(spark):
    """Confusion-matrix metrics must match a Python recompute from the
    langid key's raw (declared, predicted) pairs."""
    from collections import Counter

    pairs = [
        (r["lang_declared"], r["lang_pred"])
        for r in _Q["ext_text_langid"](spark, SF_DIR).collect()
    ]
    cells = Counter(pairs)
    decl = Counter(y for y, _ in pairs)
    pred = Counter(p for _, p in pairs)
    rows = {r["lang"]: r for r in _Q["ext_eval_confusion"](spark, SF_DIR).collect()}
    assert set(rows) == set(decl) | set(pred)
    for c, r in rows.items():
        tp = cells.get((c, c), 0)
        assert r["tp"] == tp
        assert r["fp"] == pred.get(c, 0) - tp
        assert r["fn"] == decl.get(c, 0) - tp
        p = tp / pred[c] if pred.get(c) else 0.0
        q = tp / decl[c] if decl.get(c) else 0.0
        assert abs(r["precision_c"] - p) < 1e-5
        assert abs(r["recall_c"] - q) < 1e-5
        f1 = 2 * p * q / (p + q) if p + q > 0 else 0.0
        assert abs(r["f1"] - f1) < 1e-5


def test_video_neardup_recompute(spark):
    """Shared-frame pairs recomputed in Python from the raw text frames
    must match the key's output exactly (counts, sizes, overlap)."""
    from collections import defaultdict
    from itertools import combinations

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    frames = defaultdict(set)
    for r in docs:
        t = r["text"] or ""
        for i in range(0, len(t), 100):
            frames[r["doc_id"]].add(t[i : i + 100])
    byframe = defaultdict(set)
    for d, fs in frames.items():
        for fh in fs:
            byframe[fh].add(d)
    shared = defaultdict(int)
    for fh, ds in byframe.items():
        for a, b in combinations(sorted(ds), 2):
            shared[(a, b)] += 1
    expected = {k: v for k, v in shared.items() if v >= 2}
    rows = _Q["ext_mm_video_neardup"](spark, SF_DIR).collect()
    got = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert set(got) == set(expected)
    for k, r in got.items():
        assert r["shared_frames"] == expected[k]
        assert r["n_frames_a"] == len(frames[k[0]])
        assert r["n_frames_b"] == len(frames[k[1]])
        lo = min(r["n_frames_a"], r["n_frames_b"])
        assert abs(r["overlap"] - r["shared_frames"] / lo) < 1e-5


def test_incremental_fuzzy_sides_and_consistency(spark):
    """Every pair must go new-batch -> store, and any full-corpus banded
    pair straddling the split must also appear here (same bands, only
    the predicate differs)."""
    inc = _Q["ext_dedup_incremental_fuzzy"](spark, SF_DIR).collect()
    assert inc
    for r in inc:
        assert r["doc_a"] % 10 == 0 and r["doc_b"] % 10 != 0
    full = _Q["ext_dedup_minhash_banded"](spark, SF_DIR).collect()
    straddle = {
        (a, b)
        for r in full
        for a, b in [
            (r["doc_a"], r["doc_b"]),
            (r["doc_b"], r["doc_a"]),
        ]
        if a % 10 == 0 and b % 10 != 0
    }
    got = {(r["doc_a"], r["doc_b"]) for r in inc}
    assert straddle <= got


def test_privacy_erasure_cascade_recompute(spark):
    """Deletion counts must match direct recomputation of the FK cascade,
    and deleting the forget set must leave zero orphaned child rows."""
    rows = {r["table_name"]: r for r in _Q["ext_privacy_erasure"](spark, SF_DIR).collect()}
    cust = load(spark, SF_DIR, "customer")
    orders = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")
    forget = cust.filter(F.col("c_custkey") % 97 == 0)
    n_forget = forget.count()
    del_o = orders.join(
        forget.select("c_custkey"), orders.o_custkey == F.col("c_custkey"), "left_semi"
    )
    n_del_o = del_o.count()
    n_del_l = li.join(
        del_o.select("o_orderkey"), li.l_orderkey == del_o.o_orderkey, "left_semi"
    ).count()
    assert rows["customer"]["rows_deleted"] == n_forget > 0
    assert rows["orders"]["rows_deleted"] == n_del_o
    assert rows["lineitem"]["rows_deleted"] == n_del_l
    # applying the erasure leaves no orphans
    kept_orders = orders.join(
        forget.select("c_custkey"), orders.o_custkey == F.col("c_custkey"), "left_anti"
    )
    assert kept_orders.filter(F.col("o_custkey") % 97 == 0).count() == 0


def test_peak_concurrency_point_sessions_count(spark):
    """ADVICE r03 (medium): session spans are closed intervals, so a
    single-event session must occupy its instant — any day with at least
    one session START must report peak_concurrent >= 1, and the daily peak
    must equal a direct interval-overlap recompute at the day's boundary
    events (starts admitted before ends at equal timestamps)."""
    out = _Q["ext_peak_concurrency"](spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        if r["n_sessions_started"] > 0:
            assert r["peak_concurrent"] >= 1, (
                f"day {r['d']}: {r['n_sessions_started']} starts but "
                f"peak {r['peak_concurrent']}"
            )

    # Independent recompute: closed-interval overlap count at every start
    # instant. For each session span [s, e], concurrency sampled at any
    # start time t is |{spans: s <= t <= e}|; the max over a day's starts
    # is that day's peak under starts-first ordering.
    ev = load(spark, SF_DIR, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_lag)
    marked = ev.select(
        "user_id", "ts", "event_id",
        F.when(
            prev_ts.isNull()
            | (F.col("ts").cast("long") - prev_ts.cast("long") > 30 * 60),
            1,
        ).otherwise(0).alias("is_start"),
    )
    w_run = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        marked.withColumn("session_id", F.sum("is_start").over(w_run))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts"))
    )
    # sample a couple of days to keep the O(starts x spans) check cheap
    days = sorted(r["d"] for r in out)[:2]
    reported = {r["d"]: r["peak_concurrent"] for r in out}
    for day in days:
        starts = [
            r["s_ts"]
            for r in spans.filter(F.to_date("s_ts") == F.lit(day)).collect()
        ]
        if not starts:
            continue
        all_spans = spans.collect()
        peak = max(
            sum(1 for sp in all_spans if sp["s_ts"] <= t <= sp["e_ts"])
            for t in starts
        )
        assert reported[day] == peak, f"day {day}: {reported[day]} != {peak}"
