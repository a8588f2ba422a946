"""Sinks behind one writer interface.

The reference's only sink is BigQuery via pandas-gbq with
``if_exists=replace/append/fail`` (reference etl/bq_client.py:20-32,
etl/run.py:11). We map those modes onto Spark save modes and expose
Parquet/CSV local sinks behind the same call shape so tests and the
BigQuery path share one interface.

BigQuery uses the spark-bigquery connector (``format("bigquery")``).
The connector jar is not baked into this container, so the format is
dispatched lazily and surfaces a clear error when unavailable —
the code path itself is exercised by tests via the parquet format,
and tests/test_bq_integration.py is a skip-unless-configured smoke
that round-trips a real table wherever a connector jar + credentials
exist (jar coordinates documented in its module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# pandas-gbq if_exists -> Spark save mode
_MODE_MAP = {
    "replace": "overwrite",
    "append": "append",
    "fail": "errorifexists",
}


def write_table(
    df: DataFrame,
    target: str,
    fmt: str = "parquet",
    if_exists: str = "replace",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``target`` in ``fmt`` with reference-style modes.

    - fmt="parquet"/"csv": ``target`` is a path.
    - fmt="bigquery": ``target`` is ``dataset.tablename`` (reference
      call shape, etl/run.py:11); requires the spark-bigquery connector
      on the classpath and GOOGLE_APPLICATION_CREDENTIALS, exactly like
      the reference (.env.example:1).

    ``partition_by`` is the scale lever: a 100 TB output should be
    partitioned on its pruning column (e.g. date) so downstream scans
    prune directories.
    """
    mode = _MODE_MAP.get(if_exists)
    if mode is None:
        raise ValueError(f"if_exists must be one of {sorted(_MODE_MAP)}")

    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)

    if fmt == "parquet":
        writer.parquet(target)
    elif fmt == "csv":
        writer.option("header", True).csv(target)
    elif fmt == "orc":
        writer.orc(target)
    elif fmt == "json":
        writer.json(target)
    elif fmt == "bigquery":
        writer.format("bigquery").option("table", target).save()
    else:
        raise ValueError(f"unsupported sink format: {fmt}")


def write_range_sorted(
    df: DataFrame,
    target: str,
    sort_cols: list[str],
    num_files: int,
    fmt: str = "parquet",
) -> None:
    """Range-partition on ``sort_cols`` then sort within partitions
    before writing.

    This is the min/max data-skipping lever: each output file covers a
    disjoint range of the sort key, so parquet/ORC footer statistics let
    a point/range filter skip every non-matching file (and row group)
    without an index. At 100 TB this is the difference between scanning
    the lake and scanning one file — the poor man's Z-order for a
    single-dimension access pattern.
    """
    out = df.repartitionByRange(num_files, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    write_table(out, target, fmt=fmt)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    if_exists: str = "replace",
) -> None:
    """Write a managed table bucketed (and optionally sorted) on the
    join/agg key.

    This is the co-located-join lever at scale: two tables bucketed on
    the same key with the same bucket count join with ZERO exchange —
    each task reads matching bucket files from both sides. For a 100 TB
    fact table that removes the single largest shuffle in the pipeline.
    (Bucketing requires the session catalog, hence saveAsTable, not a
    path write.)
    """
    mode = _MODE_MAP.get(if_exists)
    if mode is None:
        raise ValueError(f"if_exists must be one of {sorted(_MODE_MAP)}")
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
