"""Oracle output-type lint: the driver's exact value-hash is
type-representation-sensitive (a DuckDB HUGEINT/UHUGEINT leaves the int64
lane in the Arrow fetch; FLOAT loses the float64 lane), so an oracle whose
FINAL output schema contains one of those types hash-misses even when every
value is identical to Spark's. Round 4's only CORRECTNESS failure
(ext_text_pack) was exactly this class; round 5 added DECIMAL to it (DuckDB's
pandas fetch demotes DECIMAL output to lossy float64 while Spark keeps
Decimal objects — pipeline_medallion / ext_tokenizer_fertility). This test
DESCRIBEs every registered oracle in DuckDB and pins the class at zero:
128-bit/float32/unsigned/decimal widths are fine internally, but every
output column must land in a driver-hashable lane
(BIGINT/INT/DOUBLE/VARCHAR/DATE/TIMESTAMP/BOOLEAN/lists thereof).
"""

from __future__ import annotations

import pytest

from dbt_pro3_spark.queries import all_oracle

_ORACLE = all_oracle()

# Types that do not survive the driver's exact-hash Arrow/pandas fetch.
_BANNED = ("HUGEINT", "UHUGEINT", "FLOAT", "UTINYINT", "USMALLINT",
           "UINTEGER", "UBIGINT", "DECIMAL")


def _banned_cols(desc_rows):
    bad = []
    for name, typ, *_ in desc_rows:
        t = typ.upper()
        # FLOAT must match exactly (DOUBLE contains no FLOAT substring in
        # DuckDB's spelling, but guard list types like FLOAT[] too).
        for b in _BANNED:
            if b == "FLOAT":
                if t == "FLOAT" or t.startswith("FLOAT[") or "(FLOAT" in t or " FLOAT" in t:
                    bad.append((name, typ))
                    break
            elif b in t:
                bad.append((name, typ))
                break
    return bad


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_output_types(duck, name):
    rows = duck.execute(f"DESCRIBE {_ORACLE[name]}").fetchall()
    bad = _banned_cols(rows)
    assert not bad, (
        f"{name}: oracle output columns {bad} use a type the driver's "
        "exact hash cannot represent — CAST them (e.g. AS BIGINT) in the "
        "oracle's final SELECT"
    )
