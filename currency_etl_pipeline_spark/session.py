"""SparkSession factory tuned for oracle parity + local[32] testing.

The same settings scale to a real cluster: AQE handles runtime
re-planning (partition coalescing, skew-join split), session timezone
is pinned to UTC so timestamp semantics are deployment-independent
(the reference had a latent Africa/Cairo-naive-string bug,
fetch.py:51-53 + docker-compose.yml:53 — we deliberately fix it).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "currency_etl_pipeline_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # Our generated expressions (shingling, minhash banks, vector math)
        # produce very large whole-stage-codegen classes; the JVM default
        # 240 MB code cache fills over a multi-query session, silently
        # disabling JIT → 5-30× slowdowns late in a run.
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Testdata parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # type — read as long, tables.load_table converts to micros
        # (truncation identical to DuckDB's ns→us read).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Engine contract: timestamps are UTC instants (TimestampType).
        # Micros parquet written isAdjustedToUTC=false would otherwise
        # infer TIMESTAMP_NTZ, which watermarks/event-time reject; with
        # the session tz pinned to UTC the instant values are identical.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    return builder.getOrCreate()


def tune_for_local(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable knobs on an externally provided session.

    The driver hands us its own SparkSession in ``entry()``/``queries()``;
    master/memory are fixed at that point, but SQL confs are not.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark
