from currency_etl_pipeline_spark.streaming.pipeline import (  # noqa: F401
    events_stream,
    windowed_rates,
    run_stream_to_memory,
    stream_upsert_snapshot,
)
