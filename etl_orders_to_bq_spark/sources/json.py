"""JSON-lines, ORC, and text sources.

The reference reads only CSV (`etl/orders_etl.py:72-75`); these widen
the source surface so the same pipelines run over the formats a lake
actually contains. Same convention as the CSV source: explicit schema,
never inference (inference is a full extra pass over 100 TB and is
non-deterministic under dirty data).

- JSONL: one record per line — splittable, so a 100 TB directory scans
  in parallel. Multiline JSON is NOT splittable; ``multiline=True`` is
  accepted but documented as the small-file-only path.
- Corrupt records: kept, not dropped — PERMISSIVE mode routes
  unparseable lines into ``corrupt_col`` for quarantine, mirroring the
  reference's trust-then-repair stance on dirty input.
- ORC: columnar alternative to Parquet with the same
  pushdown/pruning behavior; exposed for parity with lakes that
  standardized on it.
- text: one row per line (``value: string``) — the raw-corpus entry
  point for the document pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
    multiline: bool = False,
) -> DataFrame:
    """Read JSON-lines with an explicit schema; unparseable lines land
    in ``corrupt_col`` instead of failing the job."""
    full = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("multiLine", multiline)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """One row per line (or per file with ``wholetext``) as ``value``."""
    return spark.read.option("wholetext", wholetext).text(path)
