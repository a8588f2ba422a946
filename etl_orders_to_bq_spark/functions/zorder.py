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


def with_hilbert_key(
    df,
    x: Column,
    y: Column,
    bits: int = 8,
    out_col: str = "hkey",
):
    """Append the HILBERT-curve index of two normalized int columns —
    the locality-preserving alternative to :func:`zorder_key`. A
    Hilbert walk never makes the long diagonal jumps a Morton (Z)
    walk makes at quadrant seams, so equal-size key ranges map to
    tighter (x, y) rectangles: measurably narrower per-file min/max
    spans for the same file count (the reason Delta Lake moved its
    OPTIMIZE clustering from Z-order to Hilbert; algorithm is the
    public xy2d loop, Wikipedia "Hilbert curve").

    Inputs must already be in [0, 2**bits) (use
    :func:`normalize_to_bits`). Per bit level the loop reads the two
    quadrant bits, accumulates ``s*s * ((3*rx) XOR ry)``, and
    reflects/swaps the coordinate frame. The level-i frame transform
    feeds level i-1, so the expression would nest ``bits`` deep —
    each level is therefore staged in its own ``withColumns``
    projection (the repeated-squaring janino trap: one giant nested
    expression re-compiles quadratically and can exceed the method
    limit). All integer Column math, codegen'd, zero UDF, zero
    shuffle.
    """
    if 2 * bits > 62:
        raise ValueError("2*bits must fit in a signed long")
    df = df.withColumns(
        {
            "__hx": x.cast("long"),
            "__hy": y.cast("long"),
            out_col: F.lit(0).cast("long"),
        }
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        hx, hy = F.col("__hx"), F.col("__hy")
        rx = F.when(hx.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(hy.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        df = df.withColumns(
            {"__rx": rx.cast("long"), "__ry": ry.cast("long")}
        )
        rx, ry = F.col("__rx"), F.col("__ry")
        hx, hy = F.col("__hx"), F.col("__hy")
        # reflect (only when rx==1) then swap (only when ry==0)
        nx = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - hy).otherwise(hy),
        ).otherwise(hx)
        ny = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - hx).otherwise(hx),
        ).otherwise(hy)
        df = df.withColumns(
            {
                out_col: F.col(out_col)
                + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry),
                "__hx": nx,
                "__hy": ny,
            }
        )
    return df.drop("__hx", "__hy", "__rx", "__ry")
