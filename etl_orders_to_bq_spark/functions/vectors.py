"""Vector Column functions over ``array<float|double>`` embedding columns.

Built on ``zip_with`` + ``aggregate`` higher-order functions: evaluated
JVM-side per row, no UDF, no shuffle — a projection that scales linearly
with rows. Accumulation is in double precision (inputs are cast), with a
sequential left fold, which makes results bit-comparable with the DuckDB
oracle's ``list_dot_product`` on double lists.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe on zero vectors (returns null)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
