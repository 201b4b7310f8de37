"""Measure per-key Exchange-operator counts for the shuffle-ceiling pins.

Reproduces tests/test_shuffle_ceilings.py's exact measurement protocol —
clear all four session caches, build the key's DataFrame at sf0.01, count
") Exchange" in df.explain("formatted") — so a pin update is always taken
under the same cold, order-independent conditions the test enforces.

Usage:
    python scripts/measure_exchange_ceilings.py key1 key2 ...
    python scripts/measure_exchange_ceilings.py --unpinned   # every bench
        key not already in _CEILINGS / _CEILINGS_TIER2 / _CEILINGS_TIER3

Prints one `"key": n,` line per key (sorted), ready to paste into the
test's table.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = "/root/testdata/sf0.01"


def _cold():
    from dbt_pro3_spark.ext.graph import clear_graph_cache
    from dbt_pro3_spark.ext.ivf import clear_ivf_cache
    from dbt_pro3_spark.queries.r4_ops import clear_pca_cache
    from dbt_pro3_spark.queries.r4d_ops import clear_probe_cache

    clear_graph_cache()
    clear_ivf_cache()
    clear_pca_cache()
    clear_probe_cache()


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "8")
    from dbt_pro3_spark.queries import all_queries
    from dbt_pro3_spark.session import get_spark

    queries = all_queries()
    if sys.argv[1:] == ["--unpinned"]:
        from tests import test_shuffle_ceilings as tsc

        pinned = set(tsc._CEILINGS) | set(tsc._CEILINGS_TIER2)
        pinned |= set(getattr(tsc, "_CEILINGS_TIER3", {}))
        bench = json.load(open("/root/repo/bench_detail.json"))["detail"]
        keys = sorted(k for k in bench if k not in pinned)
    else:
        keys = sys.argv[1:]
    if not keys:
        print("nothing to measure", file=sys.stderr)
        return

    spark = get_spark("measure-exchange-ceilings")
    out = {}
    for k in keys:
        _cold()
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                queries[k](spark, SF_DIR).explain("formatted")
            out[k] = buf.getvalue().count(") Exchange")
        except Exception as e:  # measurement tool: report, keep going
            print(f"# {k}: ERROR {e}", file=sys.stderr)
    for k in sorted(out):
        print(f'    "{k}": {out[k]},')


if __name__ == "__main__":
    main()
