#!/usr/bin/env python
"""Isolated per-key measurement + plan capture (optimization rounds).

Usage: python scripts/measure_keys.py KEY [KEY...] [--n N] [--plans DIR --tag TAG]

For each key: builds the DataFrame, does one untimed warm run through the
noop sink, then N timed runs (default 6), printing each sample and the min
(the reproducible steady-state cost per BASELINE.md methodology). With
--plans/--tag, also writes the `.explain("formatted")` output to
DIR/<key>_<tag>.txt. Same session/env contract as bench.py
($SPARK_GRAFT_SF_DIR, local[$SPARK_GRAFT_CPUS]).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--plans", default=None, help="directory for explain output")
    ap.add_argument("--tag", default="before", help="suffix for plan files")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dbt_pro3_spark.queries import all_queries
    from dbt_pro3_spark.session import get_spark

    spark = get_spark("dbt-pro3-spark-measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for key in args.keys:
        spark.sparkContext.setJobDescription(f"measure:{key}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = queries[key](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.plans, f"{key}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"plan -> {path}")
        samples = []
        for i in range(args.n + 1):
            t0 = time.perf_counter()
            df = queries[key](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            if i == 0:
                print(f"{key}: warm {dt:.3f}")
            else:
                samples.append(dt)
        print(
            f"{key}: min {min(samples):.3f}  samples "
            + " ".join(f"{s:.3f}" for s in samples)
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
