"""Lake table access.

The reference's "lake" was timestamp-named CSV objects in GCS with
newest-file discovery (transform.py:12-25); ours is parquet read as a
whole dataset — Spark prunes partitions/row-groups and the
newest-file dance disappears (SURVEY.md §1.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
# long (spark.sql.legacy.parquet.nanosAsLong); convert to microsecond
# timestamps here. Integer DIV truncation == DuckDB's ns→us read.
_NANO_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Engine contract: timestamps are UTC instants everywhere (fixes the
    # reference's naive-local-time bug, fetch.py:51-53). Pinned here so
    # queries are correct even on a caller session with a local tz.
    # NTZ inference is disabled for the same reason: micros parquet
    # written isAdjustedToUTC=false must still surface as TimestampType
    # (instants) or event-time/watermark operators reject the column.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the cluster's default parallelism
    — never down.

    Scan parallelism follows input splits
    (``spark.sql.files.maxPartitionBytes``); a small file holding
    compute-heavy rows (documents: ~300 chars in, ~50 shingle strings
    out) otherwise pins the whole expression pipeline to one core. At
    100 TB the input has more splits than cores and this is a no-op;
    the shuffle it adds at small scale moves raw text only (cheap,
    before the expansion).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    # The df.rdd probe costs one query-planning driver round-trip per
    # query build. It stays anyway: the cheap alternative (counting
    # inputFiles) is WRONG for the many-tiny-files case — Spark packs
    # small files into shared partitions (openCostInBytes), so a scan
    # with files >= cores can still yield partitions < cores, which is
    # precisely the compute-heavy-small-input regime spread() fixes.
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every lake table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
