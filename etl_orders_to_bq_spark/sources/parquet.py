"""Parquet source + testdata loader.

Parquet is the scale path: columnar, predicate/projection pushdown into
row groups, partition pruning on directory layout. ``load_tables``
registers the driver fixture tables as temp views so both the DataFrame
API and ``spark.sql`` can reach them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..schemas import TESTDATA_TABLES

# Parquet columns that SOME fixture generations write as
# TIMESTAMP(NANOS) — Spark's reader rejects nanos outright, so these
# are read as long (legacy conf) and converted to microsecond
# timestamps by integer division (truncation, matching what
# micro-precision engines like DuckDB do on read). Generations that
# already store micros come back as timestamps and are left alone.
NANO_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing nano timestamps to micros."""
    nano_cols = NANO_TS_COLUMNS.get(name, [])
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nano_cols:
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load fixture tables from ``sf_dir`` and register temp views."""
    out: dict[str, DataFrame] = {}
    for name in tables or TESTDATA_TABLES:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
