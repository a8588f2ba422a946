"""XML source (Spark 4 built-in ``xml`` data source).

Widens the reference's CSV-only surface (``etl/orders_etl.py:72-75``)
to XML feeds — still common in B2B/ERP exports. Same discipline as the
other sources: explicit schema, no inference (schema inference on XML
is an extra full pass and is fragile under mixed attributes).

Scale notes: the XML reader splits files BY FILE (a single huge XML
document is not splittable the way JSONL is), so feed directories of
many row-tagged files; ``rowTag`` selects the repeating element. For
XML embedded in a column (message payloads), use
``pyspark.sql.functions.from_xml`` instead — that path is a pure
projection and scales with rows (gate query ``xml_funcs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
