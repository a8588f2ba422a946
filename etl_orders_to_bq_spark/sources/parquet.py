"""Parquet source + testdata loader.

Parquet is the scale path: columnar, predicate/projection pushdown into
row groups, partition pruning on directory layout. ``load_tables``
registers the driver fixture tables as temp views so both the DataFrame
API and ``spark.sql`` can reach them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load fixture tables from ``sf_dir`` and register temp views."""
    out: dict[str, DataFrame] = {}
    for name in tables or TESTDATA_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
