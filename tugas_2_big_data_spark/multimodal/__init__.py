from tugas_2_big_data_spark.multimodal.binary import (
    MEDIA_META_SCHEMA,
    attach_binary_payload,
    decode_media_batch,
    extract_metadata,
    resize_images,
    sample_frames,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_binary_payload",
    "decode_media_batch",
    "extract_metadata",
    "resize_images",
    "sample_frames",
]
