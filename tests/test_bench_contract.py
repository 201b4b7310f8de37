"""Bench artifact contract: the driver tails stdout and parses the LAST
JSON line, which therefore must stay compact and complete. Rounds 3-4 lost
driver parseability when the per-key map outgrew the tail capture — this
test pins the two-line contract so it cannot regress silently."""

from __future__ import annotations

import io
import json
import os
from contextlib import redirect_stdout

import bench


def test_bench_final_line_compact_and_parseable(spark, monkeypatch, tmp_path):
    monkeypatch.setattr(
        bench, "HEADLINE", ["agg_count_star", "sort_limit_topk"]
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # divert the detail artifact: this scratch run must not clobber the
    # last full sf0.1 bench_detail.json the regression gate reads
    detail_path = tmp_path / "bench_detail.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(detail_path))
    # bench.main() calls spark.stop() — give it a throwaway-safe wrapper so
    # the session fixture survives for the rest of the suite.
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) >= 2
    detail = json.loads(lines[0])
    summary = json.loads(lines[-1])
    assert set(detail) == {"detail", "sf", "cpus"}
    assert set(detail["detail"]) == {"agg_count_star", "sort_limit_topk"}
    for field in (
        "metric", "value", "unit", "sf", "n_keys", "envelope_sec",
        "envelope_ratio", "worst_key", "worst_ratio", "n_above_2x", "queries",
    ):
        assert field in summary, field
    assert summary["n_keys"] == 2
    assert summary["unit"] == "sec"
    assert summary["value"] > 0
    # The driver's tail capture is bounded: with the full 280-key HEADLINE
    # the summary's "queries" map holds only the stable-23 set, keeping the
    # line ~1.5 KB. Assert the scaling-relevant invariant directly: the
    # summary line length is independent of HEADLINE size beyond 23 keys.
    assert len(lines[-1]) < 4096
    assert len(summary["queries"]) <= 23
    # the (diverted) detail artifact mirrors the detail line
    with open(detail_path) as f:
        assert json.load(f) == detail


def test_bench_stable23_within_envelope():
    """Builder-side regression gate (VERDICT r6 item 6): a stable-23 key in
    the last FULL local bench artifact fails when it exceeds 2x its
    recorded envelope (the driver's bar), or 1.5x with more than 0.5 s of
    absolute excess (material creep like ext_dedup_ngram_jaccard's
    2.50->2.90 s trend continuing). The absolute term exists because
    sub-second keys routinely read 1.5-2x their quiet-host envelope when
    the host has load history (BENCH_r01..r07: agg_count_distinct
    0.24-0.44 s with an unchanged plan) — a 0.15 s wobble is not a
    regression signal. Skips when bench_detail.json is not a full sf0.1
    run (e.g. right after the compactness test's 2-key scratch run)."""
    import pytest

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(here, "bench_detail.json")) as f:
            detail = json.load(f)
        with open(os.path.join(here, "baseline_keys.json")) as f:
            env = json.load(f)
    except OSError:
        pytest.skip("no local bench artifact")
    times = detail.get("detail", {})
    if detail.get("sf") != 0.1 or len(times) < len(bench.STABLE23):
        pytest.skip("bench_detail.json is not a full sf0.1 artifact")
    # The driver also runs the bench at a reduced core count and its
    # artifact can land in the tree (r10: its 8-core run tripped this gate
    # via ext_text_fingerprint's documented 2x core-scaling). The envelopes
    # are 32-core numbers; judge only 32-core artifacts. Pre-r11 artifacts
    # carry no cpus field — treat those as 32-core (the historical default).
    if detail.get("cpus") not in (None, 32):
        pytest.skip(
            f"bench_detail.json is a {detail['cpus']}-core run; envelopes are 32-core"
        )
    bad = {
        k: round(times[k] / env[k], 2)
        for k in bench.STABLE23
        if k in times
        and env.get(k, 0) > 0
        and (
            times[k] > 2.0 * env[k]
            or (times[k] > 1.5 * env[k] and times[k] - env[k] > 0.5)
        )
    }
    assert not bad, f"stable-23 keys regressed vs envelope: {bad}"
