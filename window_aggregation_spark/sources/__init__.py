from window_aggregation_spark.sources.io import (
    read_csv,
    read_delimited,
    read_json,
    read_parquet,
    read_table,
    write_csv,
    write_parquet,
)

__all__ = [
    "read_csv",
    "read_delimited",
    "read_json",
    "read_parquet",
    "read_table",
    "write_csv",
    "write_parquet",
]
