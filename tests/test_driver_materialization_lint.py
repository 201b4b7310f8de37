"""Lint pins for the two distributed-execution invariants the scale
audits check by hand each round:

1. EVERY driver-side materialization (.collect() / .toPandas()) in
   non-test source is on an explicit, justified inventory. The round-8
   audit verified all existing sites are bounded (scalar aggregates,
   <=2048-row medoid samples, grid-sized edge lists, K-iteration loops,
   PROBE_MAX-guarded matrices); this test freezes that inventory so a
   NEW site cannot appear without being reviewed and added here with its
   bound stated — "no unaudited collect" becomes a failing test instead
   of a per-round human sweep.

2. NO row-at-a-time Python UDF anywhere in non-test source (F.udf /
   @udf): every Python escape in the repo is Arrow-vectorized
   (pandas_udf, applyInPandas, mapInPandas, mapInArrow) by design;
   a row-UDF in a hot path is the classic 10-100x regression.

Matching is per-file count of the patterns, not line numbers, so
ordinary edits don't churn the pins; adding or removing a site changes
the count and forces this file to say why.
"""

from __future__ import annotations

import os
import re

import pytest

SRC_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "dbt_pro3_spark")

# file (relative to dbt_pro3_spark/) -> allowed count of
# .collect()/.toPandas() call sites, with the audited justification.
_ALLOWED_MATERIALIZATION = {
    # dbt-test lifecycle: accepted_values/relationships violation counts —
    # scalar aggregate rows per declared test
    "plans/registry.py": 2,
    # IVF medoid seed sample: hard-capped .limit(2048) + the 16-row
    # centroid frame collect
    "ext/ivf.py": 2,
    # probe matrix: PROBE_MAX=65,536 loud-bound guarded toPandas
    # (r4d_ops.py:336ff names ext_ann_* as the scale path);
    # distinct event types (grid-sized, ~5); cell-graph edge list
    # (grid-bounded, bound documented at the site)
    "queries/r4d_ops.py": 3,
    # greedy MMR loop: K=10 iterations over checkpointed candidates
    "queries/r4e_ops.py": 1,
    # audit-balance scalars: one source-sum row each
    "queries/r6b_ops.py": 2,
}

_MAT_PAT = re.compile(r"\.collect\(\)|\.toPandas\(\)")
_ROW_UDF_PAT = re.compile(r"\bF\.udf\(|\bfunctions\.udf\(|^\s*@udf\b", re.M)


def _py_sources():
    for root, _dirs, files in os.walk(SRC_ROOT):
        for f in files:
            if f.endswith(".py"):
                path = os.path.join(root, f)
                yield os.path.relpath(path, SRC_ROOT), open(path).read()


def _strip_comments_and_docstrings(text: str) -> str:
    # crude but effective for lint purposes: drop full-line comments and
    # triple-quoted blocks so prose mentioning .collect() doesn't count
    text = re.sub(r'""".*?"""', "", text, flags=re.S)
    text = re.sub(r"'''.*?'''", "", text, flags=re.S)
    return "\n".join(
        line for line in text.splitlines() if not line.lstrip().startswith("#")
    )


def test_every_driver_materialization_is_inventoried():
    found = {}
    for rel, text in _py_sources():
        n = len(_MAT_PAT.findall(_strip_comments_and_docstrings(text)))
        if n:
            found[rel] = n
    unexpected = {
        rel: n for rel, n in found.items()
        if n != _ALLOWED_MATERIALIZATION.get(rel, 0)
    }
    missing = {
        rel: n for rel, n in _ALLOWED_MATERIALIZATION.items() if rel not in found
    }
    assert not unexpected and not missing, (
        f"driver-side materialization inventory drifted — unexpected sites "
        f"{unexpected}, stale inventory entries {missing}. Every "
        ".collect()/.toPandas() in non-test source must be bounded "
        "(scalar, capped sample, grid-sized, or loud-guard) and recorded "
        "in _ALLOWED_MATERIALIZATION with its justification."
    )


def test_no_row_at_a_time_python_udfs():
    offenders = {
        rel: _ROW_UDF_PAT.findall(_strip_comments_and_docstrings(text))
        for rel, text in _py_sources()
        if _ROW_UDF_PAT.search(_strip_comments_and_docstrings(text))
    }
    assert not offenders, (
        f"row-at-a-time Python UDFs found: {offenders} — use a vectorized "
        "surface (pandas_udf / applyInPandas / mapInPandas / mapInArrow) "
        "or a built-in expression; per-row Python in a hot path is a "
        "10-100x regression at scale"
    )
