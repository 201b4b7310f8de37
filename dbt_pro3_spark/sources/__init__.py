from .readers import TESTDATA_TABLES, load, read_csv_rescued, read_with_file_metadata
from .sinks import audit_row, materialize_parquet

__all__ = [
    "TESTDATA_TABLES",
    "load",
    "read_csv_rescued",
    "read_with_file_metadata",
    "audit_row",
    "materialize_parquet",
]
