"""IPv4 network Column functions — the scalar family event-log
analytics needs for CIDR scoping (tenant ranges, internal-vs-external
split, geo block joins).

Pure integer/string Column math: dotted-quad <-> uint32 via
split + multiply-add (no regex classes, no UDF — identical
arithmetic in any engine), CIDR containment as one integer BETWEEN
against driver-computed range literals. Standard RFC 791 addressing;
no counterpart in the reference engine (SURVEY.md §2.2 scalar-family
absence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ipv4_to_long(col: Column | str) -> Column:
    """Dotted-quad string -> uint32 as long (a*2^24 + b*2^16 + c*2^8
    + d). Malformed input (wrong part count, non-numeric or
    out-of-range octet) surfaces as NULL, never an error — try-cast
    semantics so one bad log line can't fail a scan."""
    parts = F.split(_c(col), r"\.")
    # digits-only guard before the cast keeps ANSI mode from
    # throwing on non-numeric octets
    o = [
        F.when(
            F.try_element_at(parts, F.lit(i)).rlike(r"^[0-9]{1,3}\z"),
            F.try_element_at(parts, F.lit(i)).cast("long"),
        )
        for i in (1, 2, 3, 4)
    ]
    valid = (F.size(parts) == 4)
    for x in o:
        valid = valid & x.isNotNull() & (x <= 255)
    val = (
        o[0] * F.lit(16777216)
        + o[1] * F.lit(65536)
        + o[2] * F.lit(256)
        + o[3]
    )
    return F.when(valid, val)


def long_to_ipv4(col: Column | str) -> Column:
    """uint32 long -> dotted-quad string."""
    v = _c(col).cast("long")
    quad = F.concat_ws(
        ".",
        F.floor(v / 16777216).cast("string"),
        (F.floor(v / 65536) % 256).cast("string"),
        (F.floor(v / 256) % 256).cast("string"),
        (v % 256).cast("string"),
    )
    # concat_ws skips NULL parts — force null-in-null-out
    return F.when(v.isNotNull(), quad)


def cidr_bounds(cidr: str) -> tuple[int, int]:
    """Driver-side [lo, hi] inclusive uint32 bounds of a CIDR block
    — emit as literals into `ip_in_cidr` and the SQL oracle alike."""
    base, slash, bits_s = cidr.partition("/")
    if slash and not bits_s:
        # '10.0.0.0/' is a typo'd mask, not an implicit /32 — treating
        # it as a single host would make ip_in_cidr match ~nothing
        raise ValueError(f"bad CIDR mask: {cidr!r}")
    try:
        bits = int(bits_s) if bits_s else 32
    except ValueError:
        raise ValueError(f"bad CIDR mask: {cidr!r}") from None
    try:
        parts = [int(p) for p in base.split(".")]
    except ValueError:
        raise ValueError(f"bad CIDR base: {cidr!r}") from None
    if len(parts) != 4 or not all(0 <= p <= 255 for p in parts):
        raise ValueError(f"bad CIDR base: {cidr!r}")
    if not 0 <= bits <= 32:
        raise ValueError(f"bad CIDR mask: {cidr!r}")
    addr = (
        parts[0] * 16777216 + parts[1] * 65536 + parts[2] * 256 + parts[3]
    )
    mask = ((1 << bits) - 1) << (32 - bits) if bits else 0
    lo = addr & mask
    hi = lo | (0xFFFFFFFF >> bits if bits else 0xFFFFFFFF)
    return lo, hi


def ip_in_cidr(col: Column | str, cidr: str) -> Column:
    """True when the dotted-quad string falls inside ``cidr`` —
    one integer BETWEEN over driver-computed literal bounds."""
    lo, hi = cidr_bounds(cidr)
    v = ipv4_to_long(col)
    return F.when(v.isNotNull(), (v >= F.lit(lo)) & (v <= F.lit(hi)))
