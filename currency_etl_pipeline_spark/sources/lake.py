"""Lake zones: schema-declared CSV/parquet IO + file-metadata queries.

The reference's lake is timestamp-named CSV objects in GCS with
newest-by-mtime discovery (S4/S5, fetch.py:63-78, transform.py:12-25).
Spark reads whole zone directories (partition-pruned parquet in
production), making the discovery dance unnecessary — but the
capability is preserved via the binaryFile metadata source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_zone_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (S3/S4, fetch.py:63-66) — a zone directory,
    not a single object; Spark writes one file per partition."""
    df.write.mode(mode).option("header", True).csv(path)


def read_zone_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-declared CSV source (S6). The reference used inferSchema
    on every hop (transform.py:36) — explicit schema keeps types
    deterministic and skips the extra inference scan."""
    return spark.read.schema(schema).option("header", True).csv(path)


def latest_file(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Newest-file discovery as a query (S5/T6, transform.py:12-25):
    binaryFile metadata (no content read) → max-by modificationTime.
    One row: (path, modificationTime, length)."""
    meta = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", True)
        .load(path)
        .select("path", "modificationTime", "length")
    )
    return meta.orderBy(F.desc("modificationTime"), F.desc("path")).limit(1)


def write_zone_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format LLM data pipelines
    actually move corpora in (one document object per line). Spark's
    json writer IS jsonl: one object per line, one file per partition,
    so a 100 TB corpus writes embarrassingly parallel."""
    df.write.mode(mode).json(path)


def read_zone_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-declared JSON-lines source. Explicit schema, same
    rationale as read_zone_csv: inference costs an extra full scan and
    drifts on sparse fields (a field absent from the sampled files
    silently vanishes from the schema). Malformed lines fail loudly
    (FAILFAST) — a training corpus with silently dropped documents is
    worse than a failed job."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_zone_jsonl_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
):
    """JSONL source with a QUARANTINE channel:
    (good_rows, bad_rows, release).

    The third ingest stance, between FAILFAST (read_zone_jsonl — right
    when any corruption should stop the job) and silent DROPMALFORMED
    (never right for a training corpus): PERMISSIVE mode routes each
    malformed line's raw text into a `_corrupt_record` column, and the
    two returned frames split on it — good rows typed by the declared
    schema, bad rows as (corrupt_record) for a quarantine sink an
    operator can inspect and replay. At 100 TB this is one scan; the
    split is a codegen filter, and Spark evaluates the corrupt column
    only when referenced.

    Spark (since 2.3) refuses a query whose scan references ONLY the
    corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN); the documented pattern is to cache the parsed
    frame first, which this reader does — a CACHE, not a checkpoint:
    the lineage stays recomputable from the source files if an
    executor holding cached blocks is lost (localCheckpoint would make
    the frames unrecoverable, which Spark's docs flag as unsafe under
    dynamic allocation), and nothing executes until the caller acts.
    The returned ``release()`` unpersists the parent cache; call it
    after both channels are consumed, or each ingest batch leaks one
    InMemoryRelation the caller otherwise has no handle to.
    """
    col = "_corrupt_record"
    read_schema = T.StructType(list(schema.fields) + [T.StructField(col, T.StringType())])
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", col)
        .json(path)
        .cache()
    )
    good = raw.filter(F.col(col).isNull()).select(*[f.name for f in schema.fields])
    bad = raw.filter(F.col(col).isNotNull()).select(F.col(col).alias("corrupt_record"))

    def release(blocking: bool = False) -> None:
        raw.unpersist(blocking)

    return good, bad, release
