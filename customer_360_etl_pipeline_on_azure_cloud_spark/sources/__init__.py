from .files import (
    date_from_filename,
    paths_in_date_range,
    read_csv_dim,
    read_json_daily,
    read_parquet_daily,
)
from .jdbc import read_jdbc
from .tables import load_table, load_tables

__all__ = [
    "read_jdbc",
    "date_from_filename",
    "paths_in_date_range",
    "read_csv_dim",
    "read_json_daily",
    "read_parquet_daily",
    "load_table",
    "load_tables",
]
