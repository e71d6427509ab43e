"""Cross-round bench comparison under the r14 nearest-probe convention
(SURVEY §8): each query's time is normalized by the calibration probe
nearest to its position in bench.py's HEADLINE order (ties → earlier
probe); records without a calibration_series (r13 and older) fall back
to their single start-of-run scalar. This turns the epoch-noise
adjudication that consumed rounds 10-13 into arithmetic: a row is
noise when its nearest-probe ratio is flat across records whose raw
probes differ.

Usage: python tools/analyze_bench.py OLD.json NEW.json [top_n] [--json OUT]
Prints ONE machine-readable verdict line (r15, VERDICT r14 task 4 —
the round summary must be reproducible by running this tool, not
hand-synthesized): shared-row nearest-probe median, every >=2x row
with its HEADLINE position and an adjudication flag, totals, scalars.
``--json OUT`` additionally writes the verdict to OUT (the per-round
bench_results/rNN_analysis.json artifact). The human-readable top-N
ratio lists follow on stderr-style plain lines.

Adjudication flag per >=2x row (arithmetic, no narrative):
  host_elevated — a NEW-record probe bracketing the row's position
      read >=1.5x its OLD-record counterpart: the fixed probe itself
      slowed, so the row's inflation is host noise by construction.
  unresolved — both bracketing probes flat (<1.5x): the spike is NOT
      explained by the probe series and needs an in-sequence twin
      (the r14 streaming cluster shape). These rows are the round's
      real follow-up list.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402  (position source — dicts on disk are alphabetized)


def load_record(path: str) -> dict:
    """Read a bench record, unwrapping the driver's envelope: the
    BENCH_rNN.json files the driver commits wrap bench.py's stdout
    line under "parsed"; the builder's bench_results/rNN.json files
    are the raw object."""
    rec = json.load(open(path))
    if "queries" not in rec and isinstance(rec.get("parsed"), dict):
        rec = rec["parsed"]
    if "queries" not in rec:
        raise SystemExit(
            f"{path}: no usable bench record (driver BENCH_r files with"
            " parsed=null keep only a truncated stdout tail — use the"
            " full bench_results/rNN.json artifact instead)"
        )
    return rec


def nearest_probe(record: dict) -> dict[str, float]:
    """query name -> the probe seconds that normalize it."""
    series = record.get("calibration_series")
    scalar = record["calibration"]
    out: dict[str, float] = {}
    pos = {name: i + 1 for i, name in enumerate(HEADLINE)}
    for name in record["queries"]:
        if not series or name not in pos:
            out[name] = scalar
            continue
        p = pos[name]
        best = min(series, key=lambda e: (abs(e["after"] - p), e["after"]))
        out[name] = best["sec"]
    return out


def calibrated(record: dict) -> dict[str, float]:
    probes = nearest_probe(record)
    return {
        n: (t / probes[n] if probes[n] else float("nan"))
        for n, t in record["queries"].items()
    }


def median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    if not n:
        return float("nan")
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def _bracket_probes(record: dict, pos: int) -> tuple[dict | None, dict | None]:
    """The series probes immediately before (after <= pos) and after
    (after >= pos) a HEADLINE position; None when the record has no
    series (r13 and older)."""
    series = record.get("calibration_series")
    if not series:
        return None, None
    before = [e for e in series if e["after"] <= pos]
    after = [e for e in series if e["after"] >= pos]
    return (
        max(before, key=lambda e: e["after"]) if before else None,
        min(after, key=lambda e: e["after"]) if after else None,
    )


def spike_rows(old: dict, new: dict, ratios: dict[str, float], threshold: float = 2.0):
    """Every >=threshold calibrated-ratio row, flagged arithmetically:
    host_elevated when a NEW bracketing probe reads >=1.5x its OLD
    counterpart at the same bracket side, else unresolved."""
    pos = {name: i + 1 for i, name in enumerate(HEADLINE)}
    out = []
    for name, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        if r < threshold:
            continue
        p = pos.get(name, -1)
        ob, oa = _bracket_probes(old, p)
        nb, na = _bracket_probes(new, p)
        probe_ratios = []
        for o, n in ((ob, nb), (oa, na)):
            if o and n and o["sec"] > 0:
                probe_ratios.append(round(n["sec"] / o["sec"], 2))
        flag = (
            "host_elevated"
            if any(pr >= 1.5 for pr in probe_ratios)
            else ("unresolved" if probe_ratios else "no_series")
        )
        row = {
            "name": name,
            "position": p,
            "ratio": round(r, 2),
            "old_sec": old["queries"][name],
            "new_sec": new["queries"][name],
            "bracket_probe_ratios": probe_ratios,
            "flag": flag,
        }
        for key, rec in (("old_epochs_ms", old), ("new_epochs_ms", new)):
            eps = rec.get("stream_epochs", {}).get(name)
            if eps:
                row[key] = eps
        out.append(row)
    return out


def verdict(old: dict, new: dict, old_name: str, new_name: str) -> tuple[dict, dict]:
    """(machine-readable verdict, per-row calibrated ratios) for two
    already-loaded bench records."""
    import math

    c_old, c_new = calibrated(old), calibrated(new)
    shared = sorted(set(c_old) & set(c_new))
    # math.isfinite also rejects the NaN calibrated() returns for a
    # zero-second probe (NaN is truthy, a bare `if c_old[n]` keeps it
    # and poisons the median).
    ratios = {
        n: c_new[n] / c_old[n]
        for n in shared
        if math.isfinite(c_old[n]) and math.isfinite(c_new[n]) and c_old[n] > 0
    }
    spikes = spike_rows(old, new, ratios)
    return {
        "old": old_name,
        "new": new_name,
        "old_total_raw": old["value"],
        "new_total_raw": new["value"],
        "old_cal_scalar": old["calibration"],
        "new_cal_scalar": new["calibration"],
        "shared_rows": len(shared),
        "median_calibrated_ratio": round(median(list(ratios.values())), 3),
        "spike_rows_ge_2x": spikes,
        "unresolved_count": sum(1 for s in spikes if s["flag"] == "unresolved"),
        "new_only": sorted(set(c_new) - set(c_old)),
    }, ratios


def main() -> None:
    argv = list(sys.argv[1:])
    out_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            raise SystemExit("--json requires an output path")
        out_path = argv[i + 1]
        del argv[i : i + 2]  # remove exactly the flag and ITS value
    if len(argv) < 2:
        raise SystemExit(__doc__)
    old_path, new_path = argv[0], argv[1]
    top_n = int(argv[2]) if len(argv) > 2 else 15
    old = load_record(old_path)
    new = load_record(new_path)
    p_old, p_new = nearest_probe(old), nearest_probe(new)
    v, ratios = verdict(
        old, new, os.path.basename(old_path), os.path.basename(new_path)
    )
    print(json.dumps(v))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(v, fh, indent=1, sort_keys=True)
            fh.write("\n")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:top_n]
    for name, r in worst:
        print(
            f"{r:6.2f}x  {name}  old={old['queries'][name]:.2f}s/"
            f"cal{p_old[name]:.2f}  new={new['queries'][name]:.2f}s/"
            f"cal{p_new[name]:.2f}"
        )
    best = sorted(ratios.items(), key=lambda kv: kv[1])[:top_n]
    print("-- biggest improvements --")
    for name, r in best:
        print(f"{r:6.2f}x  {name}  old={old['queries'][name]:.2f}s  new={new['queries'][name]:.2f}s")


if __name__ == "__main__":
    main()
