"""Mojibake (encoding-damage) detection and repair — the ftfy shape
(Speer, "ftfy: fixes text for you", public), as pure Column ops.

The dominant web-corpus encoding damage is UTF-8 bytes mis-decoded as
Latin-1 / Windows-1252 ("café" → "cafÃ©", "it’s" → "itâ€™s"). The
repair is the inverse round-trip: re-encode the damaged text as the
8-bit charset and re-decode the bytes as UTF-8. ftfy's core acceptance
heuristic applies unchanged: the round-trip bytes of GENUINE text are
almost never valid UTF-8 (a stray "é" is a 3-byte lead with no
continuation), so "decodes cleanly" is the repair gate — the one
documented false-positive class is text that literally spells a
mojibake sequence ("Ã©" meaning A-tilde + e-acute), which no
byte-level detector can distinguish.

Spark mechanics (zero per-row Python, whole plan in codegen):

- ``translate`` maps the 27 Windows-1252-specific characters (€ ‚ ƒ …
  ’ “ ” – — etc.) to their U+0080-9F byte positions — ftfy's
  "sloppy-windows-1252", which also covers the undefined bytes
  (0x81, 0x8D, 0x8F, 0x90, 0x9D) that strict cp1252 rejects, because
  Latin-1 decoding leaves those as the control characters already;
- ``encode(..., 'ISO-8859-1')`` then yields the original damaged
  bytes. Spark 4's codingErrorAction throws on unmappable chars, so
  the encode sits behind a short-circuiting mappability guard
  (everything ≤ U+00FF after the translate);
- ``is_valid_utf8`` (strict: overlongs and surrogates rejected) gates
  acceptance; ``decode(..., 'UTF-8')`` produces the repair.

No counterpart in the reference engine (SURVEY.md §2.2 scalar-function
absence family). The SQL oracle replays the translate table, the byte
round-trip (codepoints → hex → blob → decode) and a full UTF-8 DFA.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Windows-1252 0x80-0x9F: byte -> character (the 27 defined slots;
# 0x81/0x8D/0x8F/0x90/0x9D are undefined and pass through as the
# ISO-8859-1 control characters, which already encode correctly)
CP1252_BYTE_TO_CHAR: dict[int, str] = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}
_CP1252_CHARS = "".join(CP1252_BYTE_TO_CHAR.values())
_CP1252_BYTES = "".join(chr(b) for b in CP1252_BYTE_TO_CHAR)

# a UTF-8 lead byte read as Latin-1 is a char in U+00C2..U+00F4 —
# the cheap prefilter; pure-ASCII text round-trips to itself and is
# skipped without paying the encode
MOJIBAKE_SIGNATURE_RE = "[Â-ô]"
_LATIN1_RANGE_RE = "^[\\x00-\\xFF]*$"


def is_mojibake(col: Column | str) -> Column:
    """True when the text carries repairable UTF-8-as-Latin-1/cp1252
    damage: a lead-byte signature char, every char mappable back to a
    single byte, and the round-trip bytes forming strictly valid
    UTF-8 (the ftfy acceptance gate)."""
    c = F.col(col) if isinstance(col, str) else col
    mapped = F.translate(c, _CP1252_CHARS, _CP1252_BYTES)
    # the strict Latin-1 encode THROWS on chars > U+00FF under Spark
    # 4's strict codingErrorAction, so its mappability guard must be
    # STRUCTURAL (a lazily-evaluated CaseWhen branch), not a mere
    # earlier conjunct: Catalyst is free to split and reorder the
    # conjuncts of an AND chain when the predicate reaches a filter.
    safe_roundtrip = F.when(
        mapped.rlike(_LATIN1_RANGE_RE),
        F.is_valid_utf8(F.encode(mapped, "ISO-8859-1")),
    ).otherwise(F.lit(False))
    return c.rlike(MOJIBAKE_SIGNATURE_RE) & safe_roundtrip


def repair_mojibake(col: Column | str) -> Column:
    """The repaired text: the UTF-8 re-decode of the sloppy-cp1252
    re-encode when :func:`is_mojibake` accepts, the input unchanged
    otherwise (NULL stays NULL). One pass — doubly-damaged text
    (mojibake of mojibake) needs a second application, the ftfy
    iteration; corpus practice applies one pass per ingest."""
    c = F.col(col) if isinstance(col, str) else col
    mapped = F.translate(c, _CP1252_CHARS, _CP1252_BYTES)
    return F.when(
        is_mojibake(c), F.decode(F.encode(mapped, "ISO-8859-1"), "UTF-8")
    ).otherwise(c)


def sloppy_cp1252_mojibake(text: str) -> str:
    """Reference damage generator (driver-side, for fixtures/tests):
    what ``text`` looks like after its UTF-8 bytes are mis-decoded by
    a sloppy-cp1252 reader — the exact damage class the repair
    inverts. Pure Python on literals, never a UDF."""
    return "".join(
        CP1252_BYTE_TO_CHAR.get(b, chr(b))
        for b in text.encode("utf-8")
    )
