from prohap_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_images,
    extract_image_features,
    sample_video_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_images",
    "extract_image_features",
    "sample_video_frames",
]
