"""Empirical scaling probe: time the bucketed/banded operator family at
sf0.01 and sf0.1 (10x corpus) and report the runtime growth factor.

A quadratic (all-pairs) plan would grow ~100x in work across this range;
the banded/bucketed plans should grow roughly with data size (bounded
above by shuffle cost), so observed factors far below ~30x are direct
evidence the candidate-generation stages are not pairwise. Results are
recorded in SCALE.md §11.

Usage: python scripts/scaling_probe.py [key ...]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = [
    "agg_sum_avg_min_max",       # linear reference (plain scan+agg)
    "ext_dedup_exact",           # hash groupBy reference
    "ext_dedup_minhash_banded",
    "ext_dedup_simhash",
    "ext_dedup_ngram_jaccard",
    "ext_dedup_embedding",
    "ext_dedup_prefix_filter",
    "ext_text_line_dedup",
    "ext_text_winnowing",
    "ext_graph_triangles",
]

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from dbt_pro3_spark.queries import all_queries
    from dbt_pro3_spark.session import get_spark

    keys = sys.argv[1:] or DEFAULT_KEYS
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def run(name: str, sf_dir: str) -> float:
        df = queries[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"{'key':34s} {'sf0.01':>8s} {'sf0.1':>8s} {'factor':>7s}")
    for k in keys:
        t_small = run(k, SFS[0])
        t_big = run(k, SFS[1])
        print(f"{k:34s} {t_small:8.2f} {t_big:8.2f} {t_big / t_small:7.2f}")


if __name__ == "__main__":
    main()
