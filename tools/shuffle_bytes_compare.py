"""Measure the rolling-hash device at its design scale (VERDICT r14
task 6): the r14 claim "the 8-byte packed-long window key beats the
32-char md5 hex at 100 TB" was a docstring argument plus raw seconds.
This tool turns it into a measurement — it runs the sub-passage
rewrite's decision pipeline twice at sf0.1 on identical data, once
with the shipped rolling-hash long keys and once with the retired r13
md5-of-window-string keys (reconstructed HERE, not in the package),
and reports the actual shuffle bytes each one moves, read from the
Spark UI REST API per completed stage.

The md5 variant is byte-faithful to the r13 device: positional
16-word window strings (zip_with concat chain) → md5 hex per window →
posexplode → the identical first-occurrence ranking + island merge +
rewrite tail. Everything downstream of the window-identity column is
shared code, so the diff isolates exactly the key representation.

Usage: python tools/shuffle_bytes_compare.py [sf_dir]
Prints one JSON line; record the ratio in SURVEY §8.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _stages(ui: str, app_id: str) -> dict[tuple[int, int], dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as fh:
        rows = json.load(fh)
    return {(r["stageId"], r["attemptId"]): r for r in rows}


def _settled_stages(ui: str, app_id: str) -> dict[tuple[int, int], dict]:
    """Snapshot the completed-stage set once it stops growing: the
    status store is updated asynchronously, so an immediate read can
    miss trailing stages of the PREVIOUS run (polluting the next run's
    before/after diff) or of the run just measured."""
    prev = _stages(ui, app_id)
    for _ in range(20):
        time.sleep(0.5)
        cur = _stages(ui, app_id)
        if len(cur) == len(prev):
            return cur
        prev = cur
    return prev


def _run_and_measure(ui: str, app_id: str, build) -> dict:
    before = _settled_stages(ui, app_id)
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    after = _settled_stages(ui, app_id)
    new = [v for k, v in after.items() if k not in before]
    return {
        "sec": round(wall, 3),
        "stages": len(new),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in new),
        "input_bytes": sum(s.get("inputBytes", 0) for s in new),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("shuffle_bytes_compare")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    from currency_etl_pipeline_spark.queries.llm_prep import (
        _SUBPASS_W,
        _apply_spans,
        subpassage_rewrite,
    )
    from currency_etl_pipeline_spark.queries.text import positional_windows, spread
    from currency_etl_pipeline_spark.tables import load_table

    def docs():
        return load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def rolling():
        return subpassage_rewrite(docs())

    def md5_variant():
        """The retired r13 device: md5 over materialized window strings."""
        w = _SUBPASS_W
        d = docs().select(
            "doc_id", F.trim(F.coalesce(F.col("text"), F.lit(""))).alias("text")
        )
        kw = (
            spread(d)
            .select(
                "doc_id",
                F.posexplode_outer(
                    F.transform(positional_windows("text", w), lambda x: F.md5(x))
                ).alias("widx", "h"),
            )
            .filter(F.col("h").isNotNull())
        )
        rn = F.row_number().over(Window.partitionBy("h").orderBy("doc_id", "widx"))
        hits = kw.withColumn("rn", rn).filter(F.col("rn") > 1).select("doc_id", "widx")
        w_prev = (
            Window.partitionBy("doc_id").orderBy("widx")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev_end = F.max(F.col("widx") + w).over(w_prev)
        brk = F.when(F.col("widx") <= F.coalesce(prev_end, F.lit(-1)), 0).otherwise(1)
        w_run = (
            Window.partitionBy("doc_id").orderBy("widx")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        spans = (
            hits.withColumn("brk", brk)
            .withColumn("island", F.sum("brk").over(w_run))
            .groupBy("doc_id", "island")
            .agg(
                F.min("widx").cast("long").alias("s"),
                (F.max("widx") + w).cast("long").alias("e"),
            )
        )
        per_doc = spans.groupBy("doc_id").agg(
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias("spans"),
            F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
            F.sum(F.col("e") - F.col("s")).cast("long").alias("n_removed_words"),
        )
        return _apply_spans(d, per_doc)

    # Warm both plans once (codegen/JIT), then measure each twice and
    # keep the run with fewer bytes read... bytes are deterministic per
    # plan, so a single measured run per variant suffices; seconds are
    # reported for context only (this is a BYTES comparison).
    for build in (rolling, md5_variant):
        build().write.format("noop").mode("overwrite").save()

    out = {
        "sf_dir": sf_dir,
        "rolling": _run_and_measure(ui, app_id, rolling),
        "md5_hex": _run_and_measure(ui, app_id, md5_variant),
    }
    rw, mw = out["rolling"]["shuffle_write_bytes"], out["md5_hex"]["shuffle_write_bytes"]
    out["write_bytes_ratio_md5_over_rolling"] = round(mw / rw, 3) if rw else None
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
