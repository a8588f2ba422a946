"""Orders ETL pipeline facade.

Mirrors the reference's public API — ``process()``, ``write()``,
``find_similar_products()`` (reference etl/orders_etl.py:70-116,
etl/run.py:3-16) — over a lazy Spark core. Where the reference eagerly
materializes a pandas frame per step, here each step extends one
Catalyst logical plan; nothing runs until the sink or a collect.

Plan shape (and why it scales):
  scan(csv, all-string schema, projected)        -- pruning pushed down
    -> repair+cast projections                   -- codegen, no shuffle
    -> first-occurrence dedup (window)           -- the ONE shuffle
    -> clean-name projections                    -- codegen + 1 arrow UDF
    -> broadcast left join with products         -- no shuffle
    -> sink
Products (small dim) broadcasts under the autoBroadcastJoinThreshold; at
a 100x products scale Catalyst falls back to shuffled hash join on its
own — no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.names import clean_name
from ..functions.repair import cast_columns, repair_decimal_comma, strip_non_digits
from ..operators.dedup import first_occurrence_dedup
from ..operators.similarity import similar_products
from ..schemas import (
    ORDERS_COLUMNS,
    ORDERS_RAW_SCHEMA,
    ORDERS_TYPES,
    PRODUCTS_COLUMNS,
    PRODUCTS_RAW_SCHEMA,
    PRODUCTS_TYPES,
)
from ..sinks import write_table
from ..sources.csv import INGEST_ORDER_COL, read_csv_raw

NAME_COLUMNS = ["name", "surname", "patronymic"]


class OrdersEtl:
    """Loads processed Orders and Products data into a warehouse sink.

    Cleans, normalizes and merges two data sets into a single one prior
    to loading — the reference's contract (etl/orders_etl.py:10-15),
    rebuilt on lazy DataFrames.
    """

    def __init__(
        self,
        spark: SparkSession,
        orders_csv: str,
        products_csv: str,
        table_name: str = "output",
        sink_format: str = "parquet",
    ):
        self.spark = spark
        self.orders_csv = orders_csv
        self.products_csv = products_csv
        self.table_name = table_name
        self.sink_format = sink_format
        self.orders_df: DataFrame | None = None
        self.products_df: DataFrame | None = None
        self.output_df: DataFrame | None = None

    # -- transformation stages (each lazy, individually testable) ----------

    def cast_orders(self, raw: DataFrame) -> DataFrame:
        """O2: regex repair (decimal comma, non-digit strip) then cast."""
        repaired = raw.withColumn("sum", repair_decimal_comma("sum")).withColumn(
            "product_id", strip_non_digits("product_id")
        )
        return cast_columns(repaired, ORDERS_TYPES)

    def cast_products(self, raw: DataFrame) -> DataFrame:
        """O3: straight cast per the products schema."""
        return cast_columns(raw, PRODUCTS_TYPES)

    def clean_names(self, df: DataFrame) -> DataFrame:
        """O6 over the three name columns."""
        out = df
        for c in NAME_COLUMNS:
            out = out.withColumn(c, clean_name(c))
        return out

    def join_frames(self, orders_df: DataFrame, products_df: DataFrame) -> DataFrame:
        """O7: broadcast left equi-join, products attrs appended.

        pandas ``merge`` keeps the join key in its original column
        position (reference etl/orders_etl.py:194-198); Spark's
        ``join(on=)`` moves it first, so re-project to orders columns
        followed by the product attributes.
        """
        joined = orders_df.join(broadcast(products_df), on="product_id", how="left")
        product_attrs = [c for c in products_df.columns if c != "product_id"]
        return joined.select(*orders_df.columns, *product_attrs)

    # -- public API (reference parity) --------------------------------------

    def process(self) -> DataFrame:
        """Build the full lazy plan; returns (and stores) the output DF."""
        orders_raw = read_csv_raw(
            self.spark,
            self.orders_csv,
            ORDERS_RAW_SCHEMA,
            columns=ORDERS_COLUMNS,
            with_ingest_order=True,
        )
        products_raw = read_csv_raw(
            self.spark, self.products_csv, PRODUCTS_RAW_SCHEMA, columns=PRODUCTS_COLUMNS
        ).withColumn(INGEST_ORDER_COL, F.monotonically_increasing_id())

        orders = first_occurrence_dedup(
            self.cast_orders(orders_raw),
            keys=["order_source_id", "product_id"],
            order_col=INGEST_ORDER_COL,
        )
        orders = self.clean_names(orders).drop(INGEST_ORDER_COL)

        products = first_occurrence_dedup(
            self.cast_products(products_raw),
            keys=["product_id"],
            order_col=INGEST_ORDER_COL,
        ).drop(INGEST_ORDER_COL)

        self.orders_df = orders
        self.products_df = products
        # reference column order: orders cols then product attrs
        # (merge on product_id keeps the key in place, etl/orders_etl.py:194-198)
        self.output_df = self.join_frames(orders, products)
        return self.output_df

    def write(self, target: str | None = None, **kwargs) -> None:
        """Reference ``write_to_bq`` generalized: same modes, any sink."""
        if self.output_df is None:
            raise RuntimeError("process() must run before write()")
        write_table(
            self.output_df,
            target or self.table_name,
            fmt=self.sink_format,
            **kwargs,
        )

    # keep the reference's exact method name available too
    def write_to_bq(self, **kwargs) -> None:
        write_table(
            self.output_df, self.table_name, fmt="bigquery", **kwargs
        )

    def find_similar_products(
        self, target_id: int, candidate_ids: list[int]
    ) -> dict[int, float]:
        """Reference EP3: dict-of-scores shim over the columnar scorer."""
        if self.products_df is None:
            raise RuntimeError("process() must run before find_similar_products()")
        scored = similar_products(self.products_df, target_id, candidate_ids)
        return {int(r["product_id"]): float(r["score"]) for r in scored.collect()}
