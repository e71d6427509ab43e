"""Interleaved 32-vs-8-core A/B for the r15 anti-scaling cluster
(VERDICT r15 task 1).

The r15 driver record showed 8-10 queries reading 2.5-6.7x FASTER at
local[8] than at local[32] (minhash_index_batch_dedup 10.77 s @32 vs
1.62 s @8). Two hypotheses: (a) host contention during the driver's
hot 32-core window (its calibration probe read 1.706, 2x the norm);
(b) genuine tiny-job dispatch anti-scaling in the multi-round
collect-loop queries. A calm-window INTERLEAVED read at both core
counts separates them: if the gap is real it reproduces when the
32-core and 8-core timings of the same query run seconds apart on the
same host; if it is contention it vanishes.

Protocol: two persistent worker JVMs (local[32] and local[8], each
built by session.get_spark with SPARK_GRAFT_CPUS set, i.e. exactly the
bench's session), driven round-robin from this parent. Per round, per
query, each worker builds + noop-materializes the query once (the
bench's timed action); the parent alternates 32->8, 8->32 between
rounds so neither core count systematically lands later in a host
epoch. Per (query, cores) we report min over rounds (the repo's
established min-of-N protocol) plus the full series, and each worker
also reports the job/stage/task counts of its LAST build from the
status API - the job-count profile the tiny-job hypothesis needs.

Usage:
  python tools/core_scaling_ab.py --rounds 3 --out /tmp/ab.json q1 q2 ...
  python tools/core_scaling_ab.py --worker   # internal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _worker() -> None:
    """Read query names from stdin (one per line); for each, time one
    warm build + one timed build (noop sink) and print a JSON line.
    'CAL' times the bench's fixed calibration probe instead."""
    from currency_etl_pipeline_spark.session import get_spark
    from currency_etl_pipeline_spark.queries import all_queries

    sys.path.insert(0, ROOT)  # bench import below
    from bench import _calibration_df

    spark = get_spark("core_scaling_ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    warmed: set[str] = set()

    def _run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for line in sys.stdin:
        name = line.strip()
        if not name:
            continue
        if name == "QUIT":
            break
        try:
            if name == "CAL":
                t0 = time.perf_counter()
                _run(_calibration_df(spark, SF_DIR))
                print(json.dumps({"name": "CAL", "sec": round(time.perf_counter() - t0, 3)}), flush=True)
                continue
            build = specs[name].spark
            if name not in warmed:  # bench warms once per JVM
                _run(build(spark, SF_DIR))
                warmed.add(name)
            group = f"ab_{name}_{time.monotonic_ns()}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            _run(build(spark, SF_DIR))
            sec = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobGroup(None, None)
            tracker = spark.sparkContext.statusTracker()
            jvm_tracker = spark._jsc.sc().statusTracker()  # noqa: SLF001
            job_ids = tracker.getJobIdsForGroup(group)
            stage_ids = set()
            for jid in job_ids:
                info = jvm_tracker.getJobInfo(jid)
                if info.isDefined():
                    for sid in info.get().stageIds():
                        stage_ids.add(int(sid))
            n_tasks = 0
            for sid in stage_ids:
                sinfo = jvm_tracker.getStageInfo(sid)
                if sinfo.isDefined():
                    n_tasks += int(sinfo.get().numTasks())
            print(
                json.dumps(
                    {
                        "name": name,
                        "sec": sec,
                        "n_jobs": len(job_ids),
                        "n_stages": len(stage_ids),
                        "n_tasks": n_tasks,
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 - report, keep serving
            print(json.dumps({"name": name, "error": str(exc)[:300]}), flush=True)
    spark.stop()


class _Remote:
    def __init__(self, cpus: int) -> None:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        self.cpus = cpus
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=env,
            cwd=ROOT,
        )

    def run(self, name: str) -> dict:
        self.proc.stdin.write(name + "\n")
        self.proc.stdin.flush()
        return json.loads(self.proc.stdout.readline())

    def quit(self) -> None:
        try:
            self.proc.stdin.write("QUIT\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:  # noqa: BLE001
            self.proc.kill()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", default="32,8")
    ap.add_argument("--out", default="/tmp/core_scaling_ab.json")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    if args.worker:
        _worker()
        return

    cpu_list = [int(c) for c in args.cpus.split(",")]
    workers = {c: _Remote(c) for c in cpu_list}
    results: dict[str, dict] = {
        q: {str(c): {"series": [], "profile": None} for c in cpu_list} for q in args.queries
    }
    cal: dict[str, list] = {str(c): [] for c in cpu_list}
    for rnd in range(args.rounds):
        order = cpu_list if rnd % 2 == 0 else list(reversed(cpu_list))
        for c in order:
            cal[str(c)].append(workers[c].run("CAL").get("sec"))
        for q in args.queries:
            for c in order:
                r = workers[c].run(q)
                if "error" in r:
                    results[q][str(c)]["series"].append(r["error"])
                else:
                    results[q][str(c)]["series"].append(r["sec"])
                    results[q][str(c)]["profile"] = {
                        k: r[k] for k in ("n_jobs", "n_stages", "n_tasks")
                    }
            print(
                json.dumps({"round": rnd, "query": q, **{str(c): results[q][str(c)]["series"][-1] for c in cpu_list}}),
                flush=True,
            )
    for w in workers.values():
        w.quit()
    for q in args.queries:
        for c in cpu_list:
            s = [x for x in results[q][str(c)]["series"] if isinstance(x, float)]
            results[q][str(c)]["min"] = min(s) if s else None
    out = {"sf_dir": SF_DIR, "rounds": args.rounds, "cal": cal, "queries": results}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"out": args.out, "cal": cal}), flush=True)


if __name__ == "__main__":
    main()
