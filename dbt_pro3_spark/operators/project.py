"""Projection operators.

``typed_cast`` reproduces the bronze-layer full-width CAST projection that
freezes schema-on-read (reference customers_bronze.sql:23-41 and siblings):
every column explicitly cast to its target type, optionally trimmed first
(premiums_bronze.sql:24-38 TRIMs strings before casting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def typed_cast(df: DataFrame, spec: dict[str, str], trim_strings: bool = False) -> DataFrame:
    """Project columns with explicit casts.

    spec: {column_name: spark_type_ddl}. Column order follows the spec —
    a projection, not a mutation, so Catalyst prunes the parquet scan to
    exactly these columns (check .explain() ReadSchema).
    """
    cols = []
    for name, typ in spec.items():
        c = F.col(name)
        if trim_strings and typ.lower() == "string":
            c = F.trim(c)
        cols.append(c.cast(typ).alias(name))
    return df.select(*cols)
