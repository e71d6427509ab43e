"""Streaming catalog queries — real Structured Streaming executions,
hash-checked against batch SQL oracles where the semantics align
(complete-mode tumbling windows ≡ batch date_trunc aggregation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.streaming.pipeline import (
    events_stream,
    run_stream_to_memory,
    windowed_rates,
)


@query(
    "streaming_hourly_rates",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           round(CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An ACTUAL Structured Streaming run (file source → watermark →
    tumbling 1h windows → memory sink, driven to completion) whose
    complete-mode result must equal the batch date_trunc aggregation —
    the streaming generalization of the reference's poll loop
    (app.py:23-25) with exact-sum semantics."""
    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    agg = windowed_rates(stream, window="1 hour", watermark="30 minutes")
    return run_stream_to_memory(agg, spark, output_mode="complete")
