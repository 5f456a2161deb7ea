from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .readers import read_dirty_csv, read_orc
from .sinks import write_json, write_orc, write_parquet
from .upsert import read_keyed_table, upsert, vacuum

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_dirty_csv",
    "read_orc",
    "write_json",
    "write_orc",
    "write_parquet",
    "read_keyed_table",
    "upsert",
    "vacuum",
]
