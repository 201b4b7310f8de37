#!/usr/bin/env python
"""Driver-shaped verification harness.

Imports the public contract (__spark_entry__) and does what the grading
driver does: entry() smoke on sf0.001, then every queries() key at sf0.01
compared against its oracle_sql() via DuckDB (order-insensitive,
float-tolerant). Optional argv: key prefixes to filter which queries run.

Usage:  python scripts/driver_sim.py [key_prefix ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_CORRECTNESS = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    return v


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (float, Decimal, int)) and isinstance(b, (float, Decimal, int)) \
            and not isinstance(a, bool) and not isinstance(b, bool):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def main() -> int:
    prefixes = sys.argv[1:]
    import duckdb
    import __spark_entry__ as mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    failures = 0
    n_checked = 0
    n_oracle_checked = 0
    first_fail = None

    if not prefixes:
        edf = mod.entry(spark)
        n = len(edf.collect())
        print(f"ENTRY rows: {n}  schema: {edf.schema.simpleString()}")
        if n <= 0:
            failures += 1

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECTNESS}/{t}.parquet')"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    for name in sorted(qs):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        n_checked += 1
        try:
            sdf = qs[name](spark, SF_CORRECTNESS)
            scols = sdf.columns
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            if first_fail is None:
                first_fail = name
            continue
        if name not in osql:
            print(f"{name}: rows-only, {len(srows)} rows")
            continue
        n_oracle_checked += 1
        try:
            res = con.execute(osql[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            if first_fail is None:
                first_fail = name
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        si = [scols.index(c) for c in sorted(scols)]
        di = [dcols.index(c) for c in sorted(dcols)]

        def key(row):
            return tuple((x is None, str(x)) for x in row)

        s = sorted([tuple(r[i] for i in si) for r in srows], key=key)
        d = sorted([tuple(norm(r[i]) for i in di) for r in drows], key=key)
        ok_vals = (
            ok_cols
            and len(s) == len(d)
            and all(all(eq(x, y) for x, y in zip(ra, rb)) for ra, rb in zip(s, d))
        )
        status = "OK " if ok_vals else "FAIL"
        print(f"{name}: {status} cols_match={ok_cols} rows spark={len(s)} duck={len(d)}")
        if not ok_vals:
            failures += 1
            if first_fail is None:
                first_fail = name
            if not ok_cols:
                print(f"  spark cols: {sorted(scols)}\n  duck  cols: {sorted(dcols)}")
            for ra, rb in zip(s, d):
                if not all(eq(x, y) for x, y in zip(ra, rb)):
                    print(f"  first diff:\n   S: {ra}\n   D: {rb}")
                    break

    spark.stop()
    # machine-parseable summary (VERDICT r9 item 7): one JSON line ahead of
    # the human RESULT line, so future judges / the round-start guard can
    # consume pass/fail counts without scraping per-key lines
    import json as _json

    print(
        _json.dumps(
            {
                "driver_sim": True,
                "n_checked": n_checked,
                # ADVICE r10: rows-only keys have no oracle comparison —
                # report the oracle-verified count separately so consumers
                # don't read rows-only keys as oracle-verified.
                "n_oracle_checked": n_oracle_checked,
                "n_fail": failures,
                "first_fail": first_fail,
            }
        )
    )
    print("RESULT:", "PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
