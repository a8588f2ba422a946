"""Genuine tiny PNG fixtures, generated pure-Python (zlib + struct).

These are REAL images — valid signature, IHDR, zlib-deflated IDAT with
correct CRCs — not random bytes, so the Pillow decode / average-hash
branch of multimodal/binary.py is exercised against actual pixels
whenever Pillow is importable (tests/test_multimodal.py). Grayscale
(color type 0) at exactly 8x8 on purpose: Pillow's ``convert("L")``
and ``resize((8, 8))`` are then identity transforms, so the expected
aHash is computable here with plain arithmetic, no codec in the loop.
"""

from __future__ import annotations

import struct
import zlib


def tiny_png_gray(pixels: list[list[int]]) -> bytes:
    """Encode a grayscale 8-bit PNG from a row-major pixel grid."""
    h = len(pixels)
    w = len(pixels[0])

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)  # filter 0
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# an 8x8 diagonal gradient and a near-duplicate with ONE pixel flipped:
# real near-dup images, Hamming-close under any locality-sensitive hash
GRADIENT = [[(x * 16 + y * 16) % 256 for x in range(8)] for y in range(8)]
GRADIENT_NEARDUP = [row[:] for row in GRADIENT]
GRADIENT_NEARDUP[0][0] = 255

GRADIENT_PNG = tiny_png_gray(GRADIENT)
GRADIENT_NEARDUP_PNG = tiny_png_gray(GRADIENT_NEARDUP)


def expected_ahash(pixels: list[list[int]]) -> int:
    """The aHash _ahash_pil computes for an ALREADY-8x8 grayscale
    image: threshold each pixel against the mean, bit i = pixel i in
    row-major order, as a signed 64-bit int."""
    px = [p for row in pixels for p in row]
    mean = sum(px) / len(px)
    out = 0
    for i, p in enumerate(px):
        if p > mean:
            out |= 1 << i
    return out - (1 << 64) if out >= 1 << 63 else out
