from .readers import normalize_headers, read_staging_csv, read_staging_json
from .registry import TABLE_NAMES, load_table, load_tables, register_views
from .writers import write_table

__all__ = [
    "normalize_headers",
    "read_staging_csv",
    "read_staging_json",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "write_table",
]
