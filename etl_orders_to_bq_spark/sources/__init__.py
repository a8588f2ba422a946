from .csv import read_csv_raw
from .json import read_jsonl, read_orc, read_text
from .parquet import load_tables, read_parquet
from .pydatasource import (
    JsonLinesDataSource,
    SyntheticDocsDataSource,
    register_pyjsonl,
    register_synthetic_docs,
)
from .xml import read_xml

__all__ = [
    "read_csv_raw",
    "read_parquet",
    "load_tables",
    "read_jsonl",
    "read_orc",
    "read_text",
    "read_xml",
    "SyntheticDocsDataSource",
    "register_synthetic_docs",
    "JsonLinesDataSource",
    "register_pyjsonl",
]
