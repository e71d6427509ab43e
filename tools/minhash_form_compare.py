"""Measure the r16 bands-from-sig-array derivation against the retired
r15 form (bands re-aggregated from the (id, pos, mh) relation) on
identical data — CPU seconds, shuffle bytes and stage counts per run,
read from the Spark UI REST API, plus interleaved min-of-N wall.

The r15 round prototyped the sig-array derivation, proved it
byte-equal, and measured WALL-flat at sf0.1 (the duplicate hash pass
hides on idle cores locally); the claimed win is CPU + one exchange
per indexed side, which matters at scale where cores are not idle.
This tool records exactly that: the old form is reconstructed HERE
(not in the package), everything downstream is shared, so the diff
isolates the band derivation.

Usage: python tools/minhash_form_compare.py [sf_dir] [rounds]
Prints one JSON line; record in OPTIMIZATION_r16.md.
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

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _stages(ui: str, app_id: str) -> dict[tuple[int, int], dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as fh:
        rows = json.load(fh)
    return {(r["stageId"], r["attemptId"]): r for r in rows}


def _settled(ui: str, app_id: str) -> dict[tuple[int, int], dict]:
    prev = _stages(ui, app_id)
    for _ in range(20):
        time.sleep(0.5)
        cur = _stages(ui, app_id)
        if len(cur) == len(prev):
            return cur
        prev = cur
    return prev


def _run(ui: str, app_id: str, build) -> dict:
    before = _settled(ui, app_id)
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    after = _settled(ui, app_id)
    new = [v for k, v in after.items() if k not in before]
    return {
        "sec": round(wall, 3),
        "stages": len(new),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in new),
        "cpu_sec": round(sum(s.get("executorCpuTime", 0) for s in new) / 1e9, 3),
        "run_sec": round(sum(s.get("executorRunTime", 0) for s in new) / 1e3, 3),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in new),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("minhash_form_compare")
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

    from currency_etl_pipeline_spark.operators.dedup import (
        minhash_near_dup_pairs,
        minhash_signatures,
        minhash_bands,
    )
    from currency_etl_pipeline_spark.queries.text import exploded, shingles
    from currency_etl_pipeline_spark.tables import load_table, spread

    def shingled():
        docs = spread(load_table(spark, sf_dir, "documents")).select(
            "doc_id", shingles().alias("sh")
        )
        return exploded(docs, ["doc_id"], F.col("sh"), "shingle")

    def new_form():
        return minhash_near_dup_pairs(shingled(), "doc_id", "shingle", 8, 2)

    def old_form():
        """The retired r15 shape: bands re-aggregated from (id, pos, mh)."""
        sig = minhash_signatures(shingled(), "doc_id", "shingle", 8)
        sigarr = sig.groupBy("doc_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mh"))), lambda x: x["mh"]
            ).alias("sig")
        )
        bands = minhash_bands(sig, "doc_id", 2)
        a = bands.select(F.col("doc_id").alias("id_a"), "band", "band_key")
        b = bands.select(F.col("doc_id").alias("id_b"), "band", "band_key")
        cand = (
            a.join(b, ["band", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        sa = sigarr.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
        sb = sigarr.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
        matches = F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        return (
            cand.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", F.round(matches / F.lit(8.0), 6).alias("est_jaccard"))
        )

    # parity first (cheap insurance on real data)
    o = sorted(map(tuple, old_form().collect()))
    n = sorted(map(tuple, new_form().collect()))
    assert o == n, "form drift: old and new minhash pipelines disagree"

    # warm both, then interleave
    _run(ui, app_id, old_form)
    _run(ui, app_id, new_form)
    runs = {"old": [], "new": []}
    for r in range(rounds):
        order = ("old", "new") if r % 2 == 0 else ("new", "old")
        for which in order:
            runs[which].append(_run(ui, app_id, old_form if which == "old" else new_form))
    out = {"sf_dir": sf_dir, "rounds": rounds, "rows": len(n)}
    for which, rs in runs.items():
        out[which] = {
            "min_sec": min(x["sec"] for x in rs),
            "med_cpu_sec": sorted(x["cpu_sec"] for x in rs)[len(rs) // 2],
            "med_run_sec": sorted(x["run_sec"] for x in rs)[len(rs) // 2],
            "stages": rs[-1]["stages"],
            "tasks": rs[-1]["tasks"],
            "shuffle_write_bytes": rs[-1]["shuffle_write_bytes"],
            "shuffle_read_bytes": rs[-1]["shuffle_read_bytes"],
            "series_sec": [x["sec"] for x in rs],
            "series_cpu": [x["cpu_sec"] for x in rs],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
