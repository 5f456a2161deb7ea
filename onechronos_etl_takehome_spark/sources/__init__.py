from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .readers import read_dirty_csv, read_orc, read_xml
from .sinks import write_json, write_orc, write_parquet, write_xml
from .bucketing import read_bucketed, write_bucketed
from .upsert import read_keyed_table, upsert, vacuum
# the ACID table format keeps its module namespace: its vacuum/compact
# would shadow the versioned-table functions above, and callers read
# better as txlog.create_table / txlog.merge_upsert / txlog.change_feed
from . import constraints, txlog

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_dirty_csv",
    "read_orc",
    "read_xml",
    "write_json",
    "write_orc",
    "write_xml",
    "write_parquet",
    "read_bucketed",
    "write_bucketed",
    "read_keyed_table",
    "upsert",
    "vacuum",
    "txlog",
    "constraints",
]
