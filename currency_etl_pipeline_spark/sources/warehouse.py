"""Warehouse: append-only history + newest-wins current snapshot.

The reference's warehouse is three BigQuery tables (S7-S10,
load_to_bigquery.py:32-36): historical_rates (WRITE_APPEND),
current_rates (MERGE-maintained), tmp_rates (staging, dropped).
Here: path-based parquet tables —

- historical: append-mode parquet partitioned by rate_date
  (partition pruning serves the time-range queries, SURVEY.md §4);
- current: snapshot overwritten per upsert via the MERGE rewrite
  (operators.upsert.upsert_newest_wins) with the strict
  `S.timestamp > T.timestamp` newest-wins rule;
- staging: a temp view, zero-copy (S9/S10 eliminated).

Scale notes: the snapshot table is one row per key — orders of
magnitude smaller than history; the overwrite is bounded by snapshot
size, not history size. On a production lakehouse this maps verbatim
to Delta/Iceberg MERGE INTO; the rewrite keeps v1 dependency-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.operators.upsert import upsert_newest_wins, latest_per_key

KEYS = ["base_currency", "target_currency"]


class Warehouse:
    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base = base_path
        self.historical_path = os.path.join(base_path, "historical_rates")
        self.current_path = os.path.join(base_path, "current_rates")

    # -- S7: create-if-absent is implicit in path-based parquet append --

    def append_historical(self, batch: DataFrame) -> None:
        """S8: append-only history, partitioned by event date so
        time-range queries prune partitions."""
        (
            batch.withColumn("rate_date", F.to_date("timestamp"))
            .write.mode("append")
            .partitionBy("rate_date")
            .parquet(self.historical_path)
        )

    def historical(self) -> DataFrame:
        return self.spark.read.parquet(self.historical_path).drop("rate_date")

    def upsert_current(self, batch: DataFrame) -> None:
        """J1-J3: MERGE rewrite. Equal timestamps keep the existing row
        (load_to_bigquery.py:102's strict `>`); the update batch is
        deduped to its own newest first."""
        if not os.path.exists(self.current_path):
            snap = latest_per_key(batch, KEYS, "timestamp")
        else:
            current = self.current()
            snap = upsert_newest_wins(current, batch, KEYS, "timestamp")
        # Snapshot overwrite must not read its own output lazily:
        # write to a temp subdir then swap.
        tmp = self.current_path + "__staging"
        snap.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.current_path)

    def current(self) -> DataFrame:
        return self.spark.read.parquet(self.current_path)

    def load_batch(self, batch: DataFrame) -> None:
        """EP1 load stage: one batch → history append + snapshot upsert."""
        self.append_historical(batch)
        self.upsert_current(batch)
