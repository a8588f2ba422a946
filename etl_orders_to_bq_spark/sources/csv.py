"""CSV source with the "raw in" convention.

The reference reads CSV with a projection allowlist and defers typing
(reference etl/orders_etl.py:72-75). We read with an explicit
all-StringType schema (no inference — inference would destroy the dirty
values the repair operators exist for), then ``.select()`` the allowlist.
Catalyst pushes the projection into the scan (ColumnPruning), so at scale
the scan only materializes the allowlisted columns.

``with_ingest_order=True`` tags each row with a file-order id used by
first-occurrence dedup. ``monotonically_increasing_id()`` is monotonic
*within* a partition and partition ids are ordered by file split order,
so for a CSV directory read the ids reproduce (file, offset) order —
exactly the "first row in file order" the reference relies on. At 100 TB
one would instead carry an explicit ordering column (e.g. an ingest
timestamp or source offset); the operator in ``operators/dedup.py``
accepts any ordering column for that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INGEST_ORDER_COL = "__ingest_order"


CORRUPT_RECORD_COL = "__corrupt_record"


def read_csv_raw(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    columns: list[str] | None = None,
    with_ingest_order: bool = False,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read CSV with header + explicit all-string schema, then project.

    ``keep_corrupt=True`` switches to PERMISSIVE capture: structurally
    broken lines land whole in ``__corrupt_record`` instead of being
    silently null-filled — at 100 TB, rows you can't account for are
    rows you can't debug. Filter ``df.where(col(CORRUPT_RECORD_COL)
    .isNotNull())`` into a quarantine sink.
    """
    if keep_corrupt:
        schema = T.StructType(
            schema.fields + [T.StructField(CORRUPT_RECORD_COL, T.StringType(), True)]
        )
    reader = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
    )
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_RECORD_COL)
    df = reader.csv(path)
    extra = [CORRUPT_RECORD_COL] if keep_corrupt else []
    if with_ingest_order:
        df = df.withColumn(INGEST_ORDER_COL, F.monotonically_increasing_id())
        if columns:
            df = df.select(*columns, *extra, INGEST_ORDER_COL)
    elif columns:
        df = df.select(*columns, *extra)
    return df
