"""Multimodal columns: opaque binary payloads + typed metadata."""

from essentials_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_images,
    extract_image_features,
    sample_video_frames,
    synth_media,
)
