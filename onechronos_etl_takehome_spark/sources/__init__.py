from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .readers import read_dirty_csv
from .sinks import write_json, write_parquet

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_dirty_csv",
    "write_json",
    "write_parquet",
]
