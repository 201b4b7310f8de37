"""Doc-parity guards: SURVEY.md Appendix A must list exactly the registry's
key set (regenerate with scripts/gen_survey_appendix.py after adding keys),
and bench.py's HEADLINE keys must all exist in the registry. Keeps the
docs/bench surface from drifting behind the registry the way the round-4
snapshot stragglers did (ADVICE r4)."""

from __future__ import annotations

import re
from pathlib import Path

from dbt_pro3_spark.queries import all_oracle, all_queries

ROOT = Path(__file__).resolve().parent.parent


def _appendix_keys() -> set[str]:
    text = (ROOT / "SURVEY.md").read_text()
    appendix = text[text.index("## Appendix A") :]
    keys = set(re.findall(r"^\| ([a-z][a-z0-9_]+) \| [O-] \|", appendix, re.M))
    keys.discard("key")  # the markdown table header row
    return keys


def test_appendix_matches_registry():
    reg = set(all_queries())
    app = _appendix_keys()
    assert app == reg, (
        f"SURVEY Appendix A drift — missing: {sorted(reg - app)}, "
        f"stale: {sorted(app - reg)}; rerun scripts/gen_survey_appendix.py"
    )


def test_appendix_counts_line():
    text = (ROOT / "SURVEY.md").read_text()
    m = re.search(r"All registered `queries\(\)` keys — (\d+) total, (\d+) with", text)
    assert m, "Appendix A header line missing"
    assert int(m.group(1)) == len(all_queries())
    assert int(m.group(2)) == len(all_oracle())


def test_headline_keys_registered():
    import bench

    reg = set(all_queries())
    missing = [k for k in bench.HEADLINE if k not in reg]
    assert not missing, f"bench.py HEADLINE keys not in registry: {missing}"


def test_registry_keys_have_baseline_or_are_new():
    """Every HEADLINE key should have an envelope entry once benched; this
    only asserts the envelope file parses and covers the stable-23 set
    (new keys legitimately lack an envelope until their first BASELINE
    row lands)."""
    import json

    import bench

    env = json.loads((ROOT / "baseline_keys.json").read_text())
    stable23 = bench.STABLE23
    missing = [k for k in stable23 if k not in env]
    assert not missing, f"stable-23 keys missing from baseline_keys.json: {missing}"
