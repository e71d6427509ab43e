from currency_etl_pipeline_spark.multimodal.codecs import (  # noqa: F401
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)
from currency_etl_pipeline_spark.multimodal.media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    attach_media,
    audio_fingerprint_assets,
    audio_window_rms,
    decode_image_stats,
    dhash_assets,
    resize_nearest,
    sample_frames,
)
