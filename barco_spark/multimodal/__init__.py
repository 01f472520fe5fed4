from barco_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    frame_sample,
    resize_images,
    synthetic_media,
)
