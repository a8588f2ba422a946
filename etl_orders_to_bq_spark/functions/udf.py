"""User-facing UDF surface.

The reference has no pluggable UDF API — its two custom functions are
internal (SURVEY.md §2.2). This module is the engine's official
extension point, with the performance contract made explicit:

- ``scalar_udf``: Arrow-batched pandas UDF (pd.Series -> pd.Series).
  ~10-100x faster than row-at-a-time Python; still a codegen boundary,
  so builtins win when they exist.
- ``grouped_agg_udf``: pandas UDAF (pd.Series -> scalar), usable in
  ``groupBy().agg()`` and windows.
- ``register_sql_function``: expose either to the spark.sql surface.

Example::

    from etl_orders_to_bq_spark.functions.udf import scalar_udf

    @scalar_udf("double")
    def log1p_abs(s: pd.Series) -> pd.Series:
        return np.log1p(s.abs())

    df.select(log1p_abs("x"))
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.functions import PandasUDFType, pandas_udf
from pyspark.sql.types import DataType


def scalar_udf(return_type: DataType | str):
    """Decorator: Arrow-batched scalar UDF (Series -> Series)."""

    def wrap(fn: Callable):
        return pandas_udf(return_type)(fn)

    return wrap


def grouped_agg_udf(return_type: DataType | str):
    """Decorator: Arrow-batched grouped aggregate UDF (Series -> scalar)."""

    def wrap(fn: Callable):
        return pandas_udf(return_type, functionType=PandasUDFType.GROUPED_AGG)(fn)

    return wrap


def register_sql_function(spark: SparkSession, name: str, udf) -> None:
    """Make a UDF callable from the spark.sql string surface."""
    spark.udf.register(name, udf)


def table_udf(return_schema: str):
    """Decorator: Python user-defined TABLE function (UDTF) — one input
    row in, zero or more rows out.

    The lateral-generator extension point: use for fan-out transforms a
    scalar UDF can't express (sentence splitting, record normalization,
    schema explosion). Each ``eval(*cols)`` call yields output tuples;
    rows stream through Arrow batches, so per-row Python overhead is
    amortized. Register with :func:`register_table_function` to call it
    from SQL as ``select * from my_udtf(table(...))`` or use it
    directly in the DataFrame API.
    """
    from pyspark.sql.functions import udtf

    def wrap(cls):
        # useArrow: rows move in Arrow batches (ArrowEvalPythonUDTF)
        # instead of pickled one at a time — same eval() contract
        return udtf(cls, returnType=return_schema, useArrow=True)

    return wrap


def register_table_function(spark: SparkSession, name: str, fn) -> None:
    """Make a UDTF callable from the spark.sql string surface."""
    spark.udtf.register(name, fn)
