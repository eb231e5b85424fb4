from .readers import read_csv, read_json_multiline, read_parquet, read_tables
from .writers import write_csv, write_parquet_partitioned

__all__ = [
    "read_csv",
    "read_json_multiline",
    "read_parquet",
    "read_tables",
    "write_csv",
    "write_parquet_partitioned",
]
