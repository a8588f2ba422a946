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


def lit_doubles(values) -> Column:
    """Constant ``array<double>`` literal built with ONE gateway call.

    ``F.array(*[F.lit(x) for x in vals])`` pays several py4j
    round-trips PER ELEMENT; a 64-dim centroid list rebuilt for every
    Lloyd round made expression construction — not execution — the
    dominant cost of the fit-shaped queries (silhouette at sf0.1:
    ~7 s build vs 0.5 s exec, ~24.5k gateway round-trips). One
    ``F.expr`` over double-suffixed literals parses JVM-side to the
    identical ``array(Literal, ...)`` tree — same analyzed plan, same
    results. ``repr(float)`` round-trips exactly through
    ``Double.parseDouble``, so the literal values are bit-identical.
    """
    vals = [float(x) for x in values]
    if not vals:
        return F.array().cast("array<double>")
    return F.expr("array(" + ",".join(f"{x!r}D" for x in vals) + ")")


def lit_longs(values) -> Column:
    """Constant ``array<bigint>`` literal in one gateway call (the
    ``lit_doubles`` rationale; ``L`` suffix parses to LongType)."""
    vals = [int(x) for x in values]
    if not vals:
        return F.array().cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{x}L" for x in vals) + ")")


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
