"""Reproduce the grading driver's full round sequence in ONE JVM and
instrument it for cumulative degradation (VERDICT r12 task 1).

Three consecutive driver rounds showed mid-run inflation on
byte-identical code (r12: five rows at 1.8-19x, none reproducing in
isolated fresh-JVM re-measures). r12 found one real mechanism
(memory-sink temp views never dropped). This script hunts for a second
one by running the exact sequence the driver runs — the 50-query
stale-first correctness sweep at sf0.01 (Spark collect + DuckDB oracle
side by side), then the full catalog bench at sf0.1 — in one
long-lived JVM, with probes every PROBE_EVERY queries:

  * the bench calibration query re-timed (JVM-wide slowdown detector —
    if the FIXED probe inflates, the problem is session state, not the
    queries);
  * persistent-RDD count + total cached size (leaked persist /
    localCheckpoint blocks);
  * temp-view count (leaked memory-sink / registered views);
  * JVM heap used + CodeHeap (JIT code cache) pool usage;
  * spark local-dir disk usage (shuffle-file bloat).

Finally it RE-RUNS the first ECHO_N bench queries ("echo pass"): a
query that is slower late-sequence than it was early-sequence, in the
same JVM on identical code/data, is direct evidence of cumulative
state — and the probe series says which resource.

Output: one JSON line per event to stdout and tools/hunt_<tag>.jsonl.
Usage: python tools/driver_sequence_hunt.py [tag]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

PROBE_EVERY = 10
ECHO_N = 20
SWEEP_N = 50
CORRECTNESS_SF = os.environ.get("HUNT_CORRECTNESS_SF", "/root/testdata/sf0.01")
BENCH_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jvm_probe(spark) -> dict:
    jvm = spark._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    heap_used = int(rt.totalMemory() - rt.freeMemory())
    code_used = 0
    for pool in jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans():
        if "CodeHeap" in pool.getName() or "Code Cache" in pool.getName():
            code_used += int(pool.getUsage().getUsed())
    sc = spark.sparkContext
    rdds = sc._jsc.getPersistentRDDs()
    cached_bytes = 0
    for info in sc._jsc.sc().getRDDStorageInfo():
        cached_bytes += int(info.memSize()) + int(info.diskSize())
    views = len(spark.catalog.listTables())
    local_dirs_bytes = _spark_tmp_bytes()
    return {
        "heap_used_mb": round(heap_used / 2**20, 1),
        "codeheap_used_mb": round(code_used / 2**20, 1),
        "persistent_rdds": int(rdds.size()),
        "cached_bytes_mb": round(cached_bytes / 2**20, 1),
        "temp_views": views,
        "spark_tmp_mb": local_dirs_bytes,
    }


def _spark_tmp_bytes() -> float:
    """du over this process's spark/blockmgr temp dirs (MB)."""
    total = 0
    tmp = os.environ.get("SPARK_LOCAL_DIRS", "/tmp")
    try:
        names = [
            n
            for n in os.listdir(tmp)
            if n.startswith(("blockmgr-", "spark-", "temporary"))
        ]
        if names:
            out = subprocess.run(
                ["du", "-sm"] + [os.path.join(tmp, n) for n in names],
                capture_output=True,
                text=True,
                timeout=60,
            )
            for line in out.stdout.splitlines():
                total += int(line.split()[0])
    except (OSError, ValueError, subprocess.TimeoutExpired):
        return -1.0
    return float(total)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    log_path = os.path.join(HERE, f"hunt_{tag}.jsonl")
    log_fh = open(log_path, "w")

    def emit(kind: str, **kw) -> None:
        rec = {"t": round(time.time(), 1), "kind": kind, **kw}
        line = json.dumps(rec)
        print(line, flush=True)
        log_fh.write(line + "\n")
        log_fh.flush()

    from bench import _calibration_df, _timed
    from currency_etl_pipeline_spark.queries import all_queries
    from currency_etl_pipeline_spark.queries.registry import ordered_names
    from currency_etl_pipeline_spark.session import get_spark
    from tests.oracle_harness import compare, duck_connection

    spark = get_spark("hunt")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    cal0 = _timed(lambda: _calibration_df(spark, BENCH_SF))
    emit("start", calibration=cal0, probe=_jvm_probe(spark))

    seq = 0

    def maybe_probe(phase: str) -> None:
        nonlocal seq
        seq += 1
        if seq % PROBE_EVERY == 0:
            cal = _timed(lambda: _calibration_df(spark, BENCH_SF), warm=False)
            emit("probe", phase=phase, seq=seq, calibration=cal, probe=_jvm_probe(spark))

    # ---- Phase 1: the driver's 50-query correctness sweep at sf0.01 ----
    con = duck_connection(CORRECTNESS_SF)
    sweep = ordered_names()[:SWEEP_N]
    for name in sweep:
        spec = specs[name]
        t0 = time.perf_counter()
        err = None
        try:
            df = spec.spark(spark, CORRECTNESS_SF)
            if spec.oracle is not None:
                compare(df, con, spec.oracle)
            else:
                df.count()
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            err = f"{type(exc).__name__}: {exc}"[:300]
        emit(
            "correctness",
            name=name,
            sec=round(time.perf_counter() - t0, 3),
            err=err,
        )
        maybe_probe("correctness")
    con.close()

    # ---- Phase 2: the full-catalog bench at sf0.1 (driver protocol) ----
    early: dict[str, float] = {}
    for name in list(specs):
        sec = _timed(lambda: specs[name].spark(spark, BENCH_SF))
        early[name] = sec
        emit("bench", name=name, sec=sec)
        maybe_probe("bench")

    # ---- Phase 3: echo pass — re-run the first ECHO_N bench queries ----
    echo_names = list(specs)[:ECHO_N]
    for name in echo_names:
        sec = _timed(lambda: specs[name].spark(spark, BENCH_SF))
        emit("echo", name=name, sec=sec, early_sec=early[name],
             ratio=round(sec / early[name], 2) if early[name] else None)
        maybe_probe("echo")

    cal1 = _timed(lambda: _calibration_df(spark, BENCH_SF), warm=False)
    emit("end", calibration=cal1, calibration_start=cal0,
         calibration_ratio=round(cal1 / cal0, 2) if cal0 else None,
         probe=_jvm_probe(spark))
    log_fh.close()


if __name__ == "__main__":
    main()
