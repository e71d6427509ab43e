"""Cross-round bench comparison under the r14 nearest-probe convention
(SURVEY §8): each query's time is normalized by the calibration probe
nearest to its position in bench.py's HEADLINE order (ties → earlier
probe); records without a calibration_series (r13 and older) fall back
to their single start-of-run scalar. This turns the epoch-noise
adjudication that consumed rounds 10-13 into arithmetic: a row is
noise when its nearest-probe ratio is flat across records whose raw
probes differ.

Usage: python tools/analyze_bench.py OLD.json NEW.json [top_n]
Prints medians and the top_n rows by calibrated ratio (NEW vs OLD).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402  (position source — dicts on disk are alphabetized)


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


def main() -> None:
    import math

    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    p_old, p_new = nearest_probe(old), nearest_probe(new)
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
    print(
        json.dumps(
            {
                "old": os.path.basename(old_path),
                "new": os.path.basename(new_path),
                "old_total_raw": old["value"],
                "new_total_raw": new["value"],
                "old_cal_scalar": old["calibration"],
                "new_cal_scalar": new["calibration"],
                "shared_rows": len(shared),
                "median_calibrated_ratio": round(median(list(ratios.values())), 3),
                "new_only": sorted(set(c_new) - set(c_old)),
            }
        )
    )
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
