"""Sources & sinks (SURVEY.md §2.1, S1–S7)."""

from exceldatatransform_py_spark.sources.readers import (
    TABLES,
    read_all_tables,
    read_table,
    scan_sheets_with_lineage,
)
from exceldatatransform_py_spark.sources.writers import (
    merge_update_write,
    write_partitioned_by_key,
)

__all__ = [
    "TABLES",
    "read_table",
    "read_all_tables",
    "scan_sheets_with_lineage",
    "write_partitioned_by_key",
    "merge_update_write",
]
