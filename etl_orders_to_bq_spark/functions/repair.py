"""Normalization / repair Column functions (reference O2/O3).

Pure Column expressions — JVM-side, inside whole-stage codegen, no
Python in the hot path. Reference semantics:

- decimal-comma repair: ``str.replace(",", ".")`` on ``sum``
  (reference etl/orders_etl.py:156) before the float cast;
- non-digit strip: ``str.replace(r"\\D", "")`` on ``product_id``
  (reference etl/orders_etl.py:157-159) before the int cast;
- ``astype(TYPES_SCHEMA...)`` (reference etl/orders_etl.py:160, 170)
  becomes per-column ``cast``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def repair_decimal_comma(col: Column | str) -> Column:
    """``'1300,65'`` -> ``'1300.65'`` (pre-cast repair for dirty floats)."""
    return F.regexp_replace(col, ",", ".")


def strip_non_digits(col: Column | str) -> Column:
    """``'529629c'`` -> ``'529629'`` (pre-cast repair for dirty ints)."""
    return F.regexp_replace(col, r"\D", "")


def cast_columns(df: DataFrame, types: dict[str, str]) -> DataFrame:
    """Cast listed columns to target types, preserving column order.

    Columns absent from ``types`` pass through unchanged (the reference's
    ``astype`` does the same for unlisted columns).
    """
    return df.select(
        *[
            F.col(c).cast(types[c]).alias(c) if c in types else F.col(c)
            for c in df.columns
        ]
    )
