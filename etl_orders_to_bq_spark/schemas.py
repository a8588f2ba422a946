"""Explicit schemas.

The reference declares projection allowlists (READ_SCHEMA,
reference etl/orders_etl.py:17-31) and dtype maps (TYPES_SCHEMA,
reference etl/orders_etl.py:33-49). We reproduce that contract as:

- ``*_RAW_SCHEMA``: all-StringType StructTypes used at CSV read time
  ("raw in"), so no value is lost to inference before repair;
- ``*_TYPES``: the post-repair target Spark types ("repaired cast out").

pandas ``category`` has no Spark analogue; we substitute ``string``
(dictionary encoding happens at the Parquet layer for free).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference input tables (orders / products CSVs)
# ---------------------------------------------------------------------------

ORDERS_COLUMNS = [
    "order_source_id",
    "order_created_datetime",
    "customer_id",
    "status",
    "sum",
    "quantity",
    "name",
    "surname",
    "patronymic",
    "product_id",
]

PRODUCTS_COLUMNS = ["product_id", "price", "goods_group", "manufacturer"]

# Raw CSV carries a leading unnamed index column (reference orders_s.csv);
# we read it explicitly and drop it by projection, mirroring usecols=.
ORDERS_RAW_SCHEMA = T.StructType(
    [T.StructField("_c0", T.StringType(), True)]
    + [T.StructField(c, T.StringType(), True) for c in ORDERS_COLUMNS]
)

PRODUCTS_RAW_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in PRODUCTS_COLUMNS]
)

# Post-repair target types (reference TYPES_SCHEMA, etl/orders_etl.py:33-49).
ORDERS_TYPES: dict[str, str] = {
    "order_source_id": "long",
    "order_created_datetime": "timestamp",
    "customer_id": "long",
    "status": "string",  # pandas category -> string
    "sum": "double",
    "quantity": "long",
    "name": "string",
    "surname": "string",
    "patronymic": "string",
    "product_id": "long",
}

PRODUCTS_TYPES: dict[str, str] = {
    "product_id": "long",
    "price": "double",
    "goods_group": "string",  # pandas category -> string
    "manufacturer": "string",  # pandas category -> string
}

# ---------------------------------------------------------------------------
# Driver testdata fixture tables (/root/testdata/sf*/ — see TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
