"""Z-order (Morton) clustering key — multi-dimensional data skipping.

``write_range_sorted`` narrows per-file min/max stats on ONE sort key;
sorting by a Z-order key narrows them on SEVERAL columns at once: the
bit-interleaved key maps each file to a small rectangle of the
(dim1, dim2) space, so parquet footer stats prune files for filters on
EITHER dimension. This is the open-secret behind Delta/Iceberg
Z-ordering, built here from pure Column bit math (codegen'd, no UDF,
no shuffle beyond the final range partition).

Usage::

    zkey = zorder_key(
        normalize_to_bits(F.col("o_custkey"), 1, 150000),
        normalize_to_bits(F.col("o_totalprice"), 800.0, 600000.0),
    )
    write_range_sorted(df.withColumn("_z", zkey), path, ["_z"], n)

Column min/max for normalization come from stats the caller already
has (a catalog, or one cheap agg); passing loose bounds only degrades
clustering, never correctness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def normalize_to_bits(
    col: Column,
    lo: float,
    hi: float,
    bits: int = DEFAULT_BITS,
) -> Column:
    """Map a numeric column into integer [0, 2**bits) by linear scaling,
    clipping out-of-bounds values (stale stats must not corrupt keys)."""
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(2**bits)
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(2**bits - 1), scaled))


def zorder_key(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of two normalized int columns
    into one Morton key (a's bits at odd positions, b's at even).

    Built as an unrolled bitwise expression (literal shift amounts keep
    it inside whole-stage codegen); 2*bits <= 62 so the key fits a
    long.
    """
    if 2 * bits > 62:
        raise ValueError("2*bits must fit in a signed long")
    a = a.cast("long")
    b = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return key
