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


def test_bench_final_line_compact_and_parseable(spark, monkeypatch):
    monkeypatch.setattr(
        bench, "HEADLINE", ["agg_count_star", "sort_limit_topk"]
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
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
    assert set(detail) == {"detail", "sf"}
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
    # bench_detail.json mirrors the detail line
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_detail.json")) as f:
        assert json.load(f) == detail
