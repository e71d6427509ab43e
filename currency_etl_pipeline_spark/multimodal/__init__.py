from currency_etl_pipeline_spark.multimodal.media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    attach_media,
    decode_image_stats,
    dhash_assets,
    resize_nearest,
    sample_frames,
)
