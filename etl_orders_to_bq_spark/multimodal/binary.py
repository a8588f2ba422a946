"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct;
all per-item compute runs as Arrow-batched ``mapInPandas`` so bytes move
in columnar batches, never pickled rows. The actual codec step is
stubbed (image/audio libraries are not in this container): decode is a
deterministic fake behind ``_decode_bytes`` with the real libraries'
call shape, so swapping in PIL/libav later touches exactly one function.

Scale notes
-----------
- binary payloads dominate row size: keep ``spark.sql.files.
  maxPartitionBytes`` at default (128 MB) and DON'T collect; process
  and write back columnar.
- ``mapInPandas`` streams batches (configurable via
  ``spark.sql.execution.arrow.maxRecordsPerBatch``) so one partition
  never materializes fully in Python memory.
- feature extraction emits small fixed-size vectors — output is orders
  of magnitude smaller than input, so the Python stage should be FIRST
  after the scan, before any shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png, wav, mp4, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def with_media_metadata(
    df: DataFrame, binary_col: str = "content", media_type: str = "image"
) -> DataFrame:
    """Attach the typed metadata struct, populating what is derivable
    without decoding (size, declared type); decode-derived fields are
    filled by the decode stage."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("size_bytes"),
        ),
    )


try:  # optional real codec: one `pip install pillow` from production
    from PIL import Image as _PILImage
except ImportError:  # container ships no codec libraries
    _PILImage = None


def _decode_bytes_pil(payload: bytes) -> dict | None:
    """Real decode via Pillow. A payload that is not a decodable image
    yields None metadata (the same bad-row convention as null payloads
    — one corrupt blob must not fail a 100 TB stage)."""
    import io

    try:
        img = _PILImage.open(io.BytesIO(payload))
        return {
            "format": (img.format or "").lower(),
            "width": img.width,
            "height": img.height,
        }
    except Exception:
        return None


def codec_branch(codec: str = "auto") -> str:
    """Which decode branch a given ``codec`` setting runs ON THIS HOST:
    ``"pil"`` (real Pillow decode/aHash) or ``"stub"`` (deterministic
    md5 fake). Lets tests and pipeline logs DOCUMENT the branch instead
    of guessing — the oracle-gated queries pin ``"stub"`` regardless;
    pytest asserts the real branch whenever Pillow imports."""
    if codec == "pil":
        if _PILImage is None:
            raise RuntimeError(
                "codec='pil' requested but Pillow is not installed"
            )
        return "pil"
    if codec == "auto":
        return "pil" if _PILImage is not None else "stub"
    if codec == "stub":
        return "stub"
    raise ValueError(f"unknown codec: {codec}")


def _decode_bytes(payload: bytes, codec: str = "auto") -> dict | None:
    """Decode dispatch:

    - ``"auto"``: Pillow when importable, else the deterministic stub —
      production behavior, one pip install away from real decoding.
    - ``"pil"``: force Pillow; raises if it is not installed.
    - ``"stub"``: force the md5-derived fake — deterministic and
      library-free, the contract the oracle-gated queries pin (their
      DuckDB oracles mirror the md5 arithmetic exactly).
    """
    if codec_branch(codec) == "pil":  # single source of truth
        return _decode_bytes_pil(payload)
    h = hashlib.md5(payload).digest()
    return {
        "format": ["png", "jpeg", "webp"][h[0] % 3],
        "width": 64 + h[1],
        "height": 64 + h[2],
    }


DECODED_SCHEMA = "id long, format string, width int, height int, size_bytes long"


def decode_image_batch(
    df: DataFrame, binary_col: str = "content", codec: str = "auto"
) -> DataFrame:
    """Decode stage: binary -> (format, width, height) via mapInPandas.

    Batch shape: each pandas chunk holds the Arrow batch's binary
    column; output drops the payload (decode-then-shrink before any
    shuffle). ``codec`` picks Pillow / stub (see ``_decode_bytes``);
    the oracle-gated queries pin ``"stub"`` so their DuckDB mirror
    stays exact even on a host where Pillow happens to be installed.
    """
    if codec not in ("auto", "pil", "stub"):
        raise ValueError(f"unknown codec: {codec}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # null payload (failed fetch) -> null metadata, never a
            # task-killing TypeError: one bad row must not fail a
            # 100 TB stage
            meta = pdf[binary_col].map(
                lambda p: _decode_bytes(p, codec) if p is not None else None
            )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "format": meta.map(lambda m: m["format"] if m else None),
                    "width": meta.map(lambda m: m["width"] if m else None),
                    "height": meta.map(lambda m: m["height"] if m else None),
                    "size_bytes": pdf[binary_col].map(
                        lambda p: len(p) if p is not None else None
                    ),
                }
            )

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = "id long, feature array<double>"


def extract_image_features(
    df: DataFrame, binary_col: str = "content", dim: int = 8
) -> DataFrame:
    """Feature-extract stage: binary -> fixed-size double vector.

    STUB features: md5-derived, deterministic. Real implementation
    swaps the inner function for a model forward pass over the decoded
    image; the Spark plumbing (schema, batching, shrink-before-shuffle)
    is identical.
    """

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def vec(payload: bytes) -> list[float] | None:
                if payload is None:
                    return None
                h = hashlib.md5(payload).digest()
                return [h[i] / 255.0 for i in range(dim)]

            yield pd.DataFrame(
                {"id": pdf["id"], "feature": pdf[binary_col].map(vec)}
            )

    return df.mapInPandas(features, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = "id long, frame_idx int, frame_hash string"


def frame_sample_video(
    df: DataFrame, binary_col: str = "content", every_n: int = 10, max_frames: int = 3
) -> DataFrame:
    """Frame-sample stage: one input row -> N frame rows (flatMap shape).

    STUB sampling: emits ``max_frames`` deterministic pseudo-frames per
    payload. Real implementation decodes the container and grabs every
    ``every_n``-th frame; the row-explosion plumbing is what's tested.
    """

    frame_idxs = [i * every_n for i in range(max_frames)]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[binary_col].notna()]
            # vectorized explode: repeat ids, tile frame indices; the
            # only per-item Python is the codec call itself (here the
            # stub hash), applied over the repeated payload array
            ids = pdf["id"].to_numpy().repeat(max_frames)
            idxs = frame_idxs * len(pdf)
            payloads = pdf[binary_col].to_numpy().repeat(max_frames)
            hashes = [
                hashlib.md5(p + str(i).encode()).hexdigest()
                for p, i in zip(payloads, idxs)
            ]
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return df.mapInPandas(sample, schema=FRAMES_SCHEMA)


RESIZED_SCHEMA = (
    "id long, content binary, width int, height int, size_bytes long"
)


def resize_image_batch(
    df: DataFrame,
    binary_col: str = "content",
    target_width: int = 224,
    target_height: int = 224,
) -> DataFrame:
    """Resize stage: binary -> binary (smaller payload + new dims).

    STUB resize: the fake payload is an md5 keystream of the original,
    truncated to a byte budget proportional to the target pixel count —
    deterministic, and it preserves the property the plumbing is shaped
    around: resize SHRINKS payloads, so it runs before any shuffle or
    persist (a 100 TB raw-media scan becomes a few-TB resized set). A
    real implementation swaps the inner function for
    ``PIL.Image.open(...).resize((w, h))`` bytes; schema, Arrow
    batching, and the shrink contract stay identical.
    """
    budget = max(16, (target_width * target_height) // 64)

    def _resize(payload: bytes) -> bytes | None:
        if payload is None:
            return None
        out = bytearray()
        counter = 0
        while len(out) < budget:
            out.extend(
                hashlib.md5(payload + counter.to_bytes(4, "big")).digest()
            )
            counter += 1
        return bytes(out[:budget])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf[binary_col].map(_resize)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "width": target_width,
                    "height": target_height,
                    "size_bytes": content.map(
                        lambda b: len(b) if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


PHASH_SCHEMA = "id long, phash long"


def _ahash_pil(payload: bytes, bits: int) -> int | None:
    """Real average-hash via Pillow: grayscale, resize to a sqrt(bits)
    square, threshold each pixel against the mean — the classic
    locality-sensitive image fingerprint (aHash; same join contract as
    pHash's DCT variant)."""
    import io
    import math as _math

    side = int(_math.isqrt(bits))
    try:
        img = _PILImage.open(io.BytesIO(payload)).convert("L").resize(
            (side, side)
        )
        px = list(img.getdata())
        mean = sum(px) / len(px)
        out = 0
        for i, p in enumerate(px):
            if p > mean:
                out |= 1 << i
        # to signed 64-bit (Spark LongType)
        return out - (1 << 64) if out >= 1 << 63 else out
    except Exception:
        return None


def perceptual_hash(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "id",
    bits: int = 64,
    codec: str = "auto",
) -> DataFrame:
    """Image fingerprint stage: binary -> ``bits``-bit perceptual hash
    as a signed long, the input to :func:`operators.dedup.hamming_pairs`
    (near-duplicate images = pairs within a small Hamming distance —
    the image-dedup shape of a multimodal pretraining pipeline).

    ``codec`` follows the decode dispatch contract (``_decode_bytes``):
    with Pillow present (``"auto"``/``"pil"``) the hash is a REAL
    average-hash over decoded pixels — locality-sensitive, near-dup
    images land within distance ~10. The ``"stub"`` fallback takes the
    md5 digest's first 8 bytes (big-endian signed) — deterministic and
    SQL-replayable but locality-FREE: only byte-identical payloads
    collide (distance 0), which still exercises the full fingerprint ->
    pigeonhole-join -> verify pipeline the oracle gates. Null or
    undecodable payloads yield a null hash (one bad blob never fails
    the stage).

    Shrink-before-shuffle: 8 bytes per row leave this mapInPandas
    stage; payloads never enter the pair join.
    """
    if bits != 64:
        raise ValueError("perceptual_hash emits a signed long: bits must be 64")
    if codec not in ("auto", "pil", "stub"):
        raise ValueError(f"unknown codec: {codec}")
    if codec == "pil" and _PILImage is None:
        raise RuntimeError("codec='pil' requested but Pillow is not installed")
    use_pil = codec == "pil" or (codec == "auto" and _PILImage is not None)

    def hasher(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes) -> int | None:
            if payload is None:
                return None
            if use_pil:
                return _ahash_pil(payload, bits)
            h = hashlib.md5(payload).digest()
            return int.from_bytes(h[:8], "big", signed=True)

        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "phash": pdf[binary_col].map(one)}
            )

    return df.mapInPandas(hasher, schema=PHASH_SCHEMA)
