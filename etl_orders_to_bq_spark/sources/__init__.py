from .csv import read_csv_raw
from .json import read_jsonl, read_orc, read_text
from .parquet import load_tables, read_parquet

__all__ = [
    "read_csv_raw",
    "read_parquet",
    "load_tables",
    "read_jsonl",
    "read_orc",
    "read_text",
]
