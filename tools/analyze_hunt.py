"""Analyze a driver_sequence_hunt JSONL: calibration trend, probe
resource trends, echo-pass ratios, and comparison of bench rows vs the
builder's committed r12 record (bench_results/r12.json)."""
import json, sys, os

path = sys.argv[1] if len(sys.argv) > 1 else "tools/hunt_r13.jsonl"
recs = [json.loads(l) for l in open(path)]

cals = [(r["seq"], r["calibration"], r["probe"]) for r in recs if r["kind"] == "probe"]
start = next(r for r in recs if r["kind"] == "start")
print("start calibration:", start["calibration"])
print(f"{'seq':>5} {'cal':>6} {'heapMB':>8} {'codeMB':>7} {'rdds':>5} {'cachMB':>7} {'views':>5} {'tmpMB':>7}")
for seq, c, p in cals:
    print(f"{seq:>5} {c:>6.3f} {p['heap_used_mb']:>8} {p['codeheap_used_mb']:>7} "
          f"{p['persistent_rdds']:>5} {p['cached_bytes_mb']:>7} {p['temp_views']:>5} {p['spark_tmp_mb']:>7}")
end = [r for r in recs if r["kind"] == "end"]
if end:
    e = end[0]
    print("end calibration:", e["calibration"], "ratio vs start:", e["calibration_ratio"])

echo = [r for r in recs if r["kind"] == "echo"]
if echo:
    print("\nECHO PASS (late re-run vs early run of same query, same JVM):")
    for r in sorted(echo, key=lambda x: -(x["ratio"] or 0)):
        print(f"  {r['name']:<40} early={r['early_sec']:>7.3f} late={r['sec']:>7.3f} ratio={r['ratio']}")

# vs builder r12 record
r12p = "bench_results/r12.json"
if os.path.exists(r12p):
    r12 = json.load(open(r12p))
    q12, cal12 = r12["queries"], r12["calibration"]
    bench = {r["name"]: r["sec"] for r in recs if r["kind"] == "bench"}
    calh = sum(c for _, c, _ in cals) / len(cals) if cals else start["calibration"]
    print(f"\nhunt mean calibration {calh:.3f} vs r12 record {cal12}")
    import statistics
    ratios = sorted(
        ((n, round((bench[n] / calh) / (q12[n] / cal12), 2))
         for n in bench if n in q12 and q12[n] >= 0.3),
        key=lambda t: -t[1],
    )
    vals = [r for _, r in ratios]
    if vals:
        print(f"calibrated per-query ratio vs builder-r12: median {statistics.median(vals):.2f} over {len(vals)} rows")
        print("worst 12:", ratios[:12])
        print("best 8:", ratios[-8:])
    else:
        print("no bench rows overlap the r12 record (run aborted pre-bench?)")
