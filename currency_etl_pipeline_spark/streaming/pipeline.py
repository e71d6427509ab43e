"""Structured Streaming analogs of the reference's batch pipeline.

The reference provisioned Kafka+Flink but never wired them
(docker-compose.yml:136-226); its only "streaming" is a 60 s dashboard
poll (app.py:23-25). This module is the real thing (SURVEY.md §2.I):

- `events_stream`:   file-source stream over the events table (swap
  `.format("parquet")` for `"kafka"` + the same downstream plan in
  production — Structured Streaming plans are source-agnostic).
- `windowed_rates`:  watermark + tumbling-window aggregation; late
  data beyond the watermark is dropped (the reference had no late-data
  story beyond newest-wins; we add a real one).
- `stream_upsert_snapshot`: foreachBatch → the batch MERGE rewrite
  (operators.upsert.upsert_newest_wins) — the streaming generalization
  of load_to_bigquery.py:98-111, preserving the strict
  `S.timestamp > T.timestamp` newest-wins semantic per micro-batch.

Scale notes: stateful windows shuffle on (window, key) and keep state
in the state store (RocksDB in production); watermarks bound state
size. foreachBatch upsert rewrites only the snapshot (latest-per-key ≪
event log).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.functions.scalars import dec
from currency_etl_pipeline_spark.operators.upsert import upsert_newest_wins
from currency_etl_pipeline_spark.tables import load_table


def events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream with the batch-read schema (readStream needs
    an explicit schema; we reuse load_table's nanos handling)."""
    schema = load_table(spark, path.rsplit("/", 1)[0], "events").schema if path.endswith("events.parquet") else None
    reader = spark.readStream
    if schema is not None:
        # Underlying files store ts as nanos-long; stream reads long then converts.
        import pyspark.sql.types as T

        raw_schema = T.StructType(
            [
                T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
        reader = reader.schema(raw_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path.endswith(".parquet") and "/" in path:
        # File-source streams require a directory: stream the parent
        # dir with a glob filter for the one table file.
        base, fname = path.rsplit("/", 1)
        reader = reader.option("pathGlobFilter", fname)
        df = reader.parquet(base)
    else:
        df = reader.parquet(path)
    return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))


def windowed_rates(stream: DataFrame, window: str = "1 hour", watermark: str = "30 minutes") -> DataFrame:
    """Per-type tumbling-window counts + exact sums (DECIMAL) + avg."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
        )
    )


def run_stream_to_memory(agg: DataFrame, spark: SparkSession, output_mode: str = "complete") -> DataFrame:
    """Drive a streaming aggregation to completion synchronously via the
    memory sink; returns the final result as a batch DataFrame.

    (Test/driver harness path — production would writeStream to a real
    sink with a trigger.)
    """
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    q = agg.writeStream.outputMode(output_mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_upsert_snapshot(
    spark: SparkSession,
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    snapshot_holder: dict,
) -> "object":
    """foreachBatch upsert: each micro-batch is deduped to its newest
    per key and merged newest-wins into the running snapshot (held in
    `snapshot_holder["df"]` as a cached batch DataFrame; a real
    deployment would write a parquet/Delta table path instead).
    Returns the StreamingQuery (caller stops it)."""

    def _upsert(batch_df: DataFrame, epoch_id: int) -> None:
        current = snapshot_holder.get("df")
        if current is None:
            from currency_etl_pipeline_spark.operators.upsert import latest_per_key

            new_snap = latest_per_key(batch_df, keys, ts_col, tie_breakers=["event_id"]).select(
                *snapshot_holder["cols"]
            )
        else:
            batch = batch_df.select(*snapshot_holder["cols"])
            ties = ["event_id"] if "event_id" in snapshot_holder["cols"] else []
            new_snap = upsert_newest_wins(current, batch, keys, ts_col, tie_breakers=ties)
        # Materialize so state survives the micro-batch's source views.
        rows = new_snap.collect()
        snapshot_holder["df"] = spark.createDataFrame(rows, new_snap.schema)

    return (
        stream.writeStream.outputMode("update")
        .foreachBatch(_upsert)
        .trigger(availableNow=True)
        .start()
    )
