from prohap_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    audio_container_stats,
    audio_window_features,
    decode_images,
    extract_image_features,
    resize_raster,
    sample_avi_frames,
    sample_video_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "audio_container_stats",
    "audio_window_features",
    "decode_images",
    "extract_image_features",
    "resize_raster",
    "sample_avi_frames",
    "sample_video_frames",
]
