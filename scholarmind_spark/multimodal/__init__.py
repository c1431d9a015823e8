from scholarmind_spark.multimodal.media import (
    MEDIA_META_SCHEMA,
    MEDIA_SCHEMA,
    decode_images,
    extract_features,
    frame_sample,
    media_byte_stats,
    resize_images,
    synth_media,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "MEDIA_SCHEMA",
    "decode_images",
    "extract_features",
    "frame_sample",
    "media_byte_stats",
    "resize_images",
    "synth_media",
]
