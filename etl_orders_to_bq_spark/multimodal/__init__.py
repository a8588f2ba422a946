from .binary import (
    codec_branch,
    decode_image_batch,
    extract_image_features,
    frame_sample_video,
    perceptual_hash,
    resize_image_batch,
    with_media_metadata,
)

__all__ = [
    "with_media_metadata",
    "codec_branch",
    "decode_image_batch",
    "extract_image_features",
    "frame_sample_video",
    "perceptual_hash",
    "resize_image_batch",
]
