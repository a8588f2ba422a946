from .maintenance import compact_parquet
from .writers import write_bucketed_table, write_range_sorted, write_table

__all__ = [
    "write_table",
    "write_bucketed_table",
    "write_range_sorted",
    "compact_parquet",
]
