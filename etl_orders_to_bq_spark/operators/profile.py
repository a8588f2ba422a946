"""ANALYZE-style column profiler.

``column_profile`` emits the per-column statistics block a query
optimizer (or a data-quality reviewer) reads before planning: row
count, null count, exact distinct count, min/max rendered as
strings. The ``stack``-based unpivot keeps it ONE aggregate pass +
one tiny explode — the table is scanned once regardless of column
count.

Scale note: ``count_distinct`` over many columns in one aggregate
expands partials per distinct-column; at 100 TB swap in
``approx_count_distinct`` (HLL, one pass, no expand) via
``exact=False`` — the profile is advisory there, and the gate pins
the exact path at fixture scale. No counterpart in the reference
engine (surface = `etl/orders_etl.py:17-198`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """One row per column: ``(column, n_rows, n_null, n_distinct,
    min_value, max_value)`` with min/max cast to string (the
    catalog-stats convention — orderable render, type-erased)."""
    cols = cols or df.columns
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}")
        )
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            ).alias(f"__ndv_{c}")
        )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.extend(
            [
                F.lit(c),
                F.col(f"__null_{c}"),
                F.col(f"__ndv_{c}"),
                F.col(f"__min_{c}"),
                F.col(f"__max_{c}"),
            ]
        )
    return one.select(
        F.col("__n").alias("n_rows"),
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column", "n_null", "n_distinct", "min_value", "max_value"),
    ).select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )
