"""Local stand-in for the driver's oracle comparison.

Mimics CORRECTNESS checking: row count, sorted column names, and an
order-insensitive comparison of values. Since round 5 this compare is
STRICT — the driver's hash is exact and type-lane-sensitive, and the whole
registry passes bit-exact at sf0.001/sf0.01/sf0.1 (scripts/strict_parity.py
sweeps), so the in-repo suite now enforces the same contract:

- float cells must be BIT-IDENTICAL (struct-packed; NaN == NaN, but
  +0.0 != -0.0 — the hash lanes differ);
- numeric kinds must match exactly: an int on one side and a Decimal or
  float on the other is a TYPE-LANE mismatch even when values agree
  (the round-4 ext_text_pack failure class);
- Decimals compare by their exact string (scale included);
- everything else (strings, dates, timestamps, bools, arrays) compares
  exactly.

Set PARITY_TOLERANT=1 to fall back to the old isclose(1e-9) compare when
triaging whether a strict failure is a value bug or a representation bug.

Callers can also pass ``compare(..., tolerant=True)`` explicitly: the
pipeline golden tests (tests/test_pipeline.py) replicate the REFERENCE's
models, whose gold marts aggregate raw doubles without terminal rounding —
cross-engine summation order makes bit-identity unattainable there BY
DESIGN, and those goldens are not part of the driver's hash contract. The
driver-facing registry keys always use the strict default.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import struct
from decimal import Decimal

TOLERANT = os.environ.get("PARITY_TOLERANT") == "1"


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", bool(v))
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        # Explicit kind tag: an untagged 1-element array like (("s","x"),)
        # is indistinguishable from a malformed scalar tag and crashed
        # _cell_eq's x[1] access.
        return ("arr", tuple(_norm_cell(x) for x in v))
    return ("s", str(v))


def _sort_key(row):
    return tuple(
        (x is None, repr(x)) for x in row
    )


def compare(
    spark_df, duck_con, sql: str, name: str = "?", tolerant: bool | None = None
) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity).

    ``tolerant=None`` (default) follows PARITY_TOLERANT; ``tolerant=True``
    forces the isclose(1e-9) numeric compare for callers whose contract is
    semantic replication rather than the driver's exact hash (the pipeline
    goldens)."""
    errs: list[str] = []
    srows = spark_df.collect()
    scols = spark_df.columns
    dres = duck_con.execute(sql)
    dcols = [d[0] for d in dres.description]
    drows = dres.fetchall()

    if sorted(scols) != sorted(dcols):
        errs.append(f"[{name}] columns differ: spark={sorted(scols)} duck={sorted(dcols)}")
        return errs
    if len(srows) != len(drows):
        errs.append(f"[{name}] row count differs: spark={len(srows)} duck={len(drows)}")

    order = sorted(range(len(scols)), key=lambda i: scols[i])
    sidx = {c: i for i, c in enumerate(scols)}
    didx = {c: i for i, c in enumerate(dcols)}
    snorm = sorted(
        (tuple(_norm_cell(r[sidx[scols[i]]]) for i in order) for r in srows),
        key=_sort_key,
    )
    cols_sorted = sorted(scols)
    dnorm = sorted(
        (tuple(_norm_cell(r[didx[c]]) for c in cols_sorted) for r in drows),
        key=_sort_key,
    )
    tol = TOLERANT if tolerant is None else tolerant
    for i, (a, b) in enumerate(zip(snorm, dnorm)):
        if not _rows_eq(a, b, tol):
            errs.append(f"[{name}] row {i} differs (cols {cols_sorted}):\n  spark={a}\n  duck ={b}")
            if len(errs) > 5:
                break
    return errs


def _float_eq(a: float, b: float, tol: bool) -> bool:
    if tol:
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return struct.pack("<d", a) == struct.pack("<d", b) or (
        math.isnan(a) and math.isnan(b)
    )


def _cell_eq(x, y, tol: bool) -> bool:
    if x is None or y is None:
        return x is None and y is None
    if isinstance(x, tuple) and isinstance(y, tuple) and x and y:
        if x[0] == "arr" or y[0] == "arr":
            return x[0] == y[0] and _rows_eq(x[1], y[1], tol)
        if tol and (x[0] in ("f", "i", "dec") and y[0] in ("f", "i", "dec")):
            a = float(x[1]) if x[0] != "dec" else float(Decimal(x[1]))
            b = float(y[1]) if y[0] != "dec" else float(Decimal(y[1]))
            return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
        if x[0] != y[0]:
            return False  # type-lane mismatch (int vs dec vs float)
        if x[0] == "f":
            return _float_eq(x[1], y[1], tol)
        if isinstance(x[1], tuple):
            return _rows_eq(x[1], y[1], tol)
        return x[1] == y[1]
    if isinstance(x, tuple) and isinstance(y, tuple):
        return _rows_eq(x, y, tol)
    return x == y


def _rows_eq(a, b, tol: bool = False) -> bool:
    if not isinstance(a, tuple) or not isinstance(b, tuple):
        return _cell_eq(a, b, tol)
    if len(a) != len(b):
        return False
    return all(_cell_eq(x, y, tol) for x, y in zip(a, b))
