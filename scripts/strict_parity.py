#!/usr/bin/env python
"""Strict (driver-grade) parity pre-verification.

The driver's CORRECTNESS hash is EXACT and type-lane-sensitive: identical
values in different Arrow lanes (int64 vs int128, float64 vs float32) or
floats differing by one ulp still hash-miss, which the tolerant in-repo
compare (tests/parity.py) deliberately forgives. This harness re-checks
keys under the driver's stricter contract:

- float cells must be BIT-IDENTICAL (struct.pack comparison, NaN == NaN);
- kind tags must match exactly: int-vs-Decimal / int-vs-float cross-lane
  matches are REJECTED (they signal an output-type divergence between the
  Spark schema and the oracle's DuckDB type);
- everything else (strings, dates, timestamps, bools, arrays) compares
  exactly, order-insensitive with sorted columns — same as the driver.

Usage:
    python scripts/strict_parity.py              # the next driver window (60 keys)
    python scripts/strict_parity.py 120          # first N ordered keys
    python scripts/strict_parity.py key1 key2    # specific keys
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The normalizer/comparator is SHARED with the in-repo suite (tests/parity.py)
# so the two strict contracts can never drift: _norm_cell tags type lanes,
# _rows_eq with tol=False is the driver-grade compare (bit-identical floats,
# NaN == NaN, +0.0 != -0.0, int-vs-Decimal rejected).
from tests.parity import _norm_cell as norm  # noqa: E402
from tests.parity import _rows_eq, _sort_key  # noqa: E402

SF_DIR = os.environ.get("STRICT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    import duckdb

    from dbt_pro3_spark.queries import all_oracle, all_queries
    from dbt_pro3_spark.session import get_spark

    queries = all_queries()
    oracle = all_oracle()
    args = sys.argv[1:]
    if not args:
        keys = [k for k in queries if k in oracle][:60]
    elif len(args) == 1 and args[0].isdigit():
        keys = [k for k in queries if k in oracle][: int(args[0])]
    else:
        keys = [k for k in args if k in queries and k in oracle]

    spark = get_spark("strict-parity")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_fail = 0
    for name in keys:
        try:
            sdf = queries[name](spark, SF_DIR)
            scols = sdf.columns
            srows = sdf.collect()
            dres = con.execute(oracle[name])
            dcols = [d[0] for d in dres.description]
            drows = dres.fetchall()
            msgs = []
            if sorted(scols) != sorted(dcols):
                msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
            elif len(srows) != len(drows):
                msgs.append(f"rows spark={len(srows)} duck={len(drows)}")
            else:
                order = sorted(scols)
                si = {c: i for i, c in enumerate(scols)}
                di = {c: i for i, c in enumerate(dcols)}
                sn = sorted(
                    (tuple(norm(r[si[c]]) for c in order) for r in srows),
                    key=_sort_key,
                )
                dn = sorted(
                    (tuple(norm(r[di[c]]) for c in order) for r in drows),
                    key=_sort_key,
                )
                for i, (a, b) in enumerate(zip(sn, dn)):
                    if not _rows_eq(a, b, tol=False):
                        msgs.append(f"row {i} (cols {order}) spark={a} duck={b}")
                        break
            if msgs:
                n_fail += 1
                print(f"{name}: STRICT-FAIL  {msgs[0]}")
            else:
                print(f"{name}: strict-ok  ({len(srows)} rows)")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
        sys.stdout.flush()
    print(f"RESULT: {'PASS' if n_fail == 0 else f'{n_fail} FAILURES'} over {len(keys)} keys")
    spark.stop()


if __name__ == "__main__":
    main()
