"""Scale-up curve for the scale-sensitive operator families (r15):
time a set of catalog queries at sf0.001 / sf0.01 / sf0.1 (10x data
per step, identical protocol to bench.py's min-of-2 noop timing) and
report the wall-time growth per decade. The point is the SHAPE of the
curve, not the absolute seconds: an operator whose decision pipeline
is linear in the data should approach 10x per decade as data starts
to dominate fixed overhead (JVM/protocol/planning); a ratio well
under 10x at the top decade says fixture scale is still
overhead-dominated (headroom, not a scaling wall); a ratio OVER ~10x
is superlinear growth and a scaling bug worth a plan audit.

Usage: python tools/scaling_curve.py [query ...]
Defaults to a representative set spanning the families whose 100 TB
claims the docstrings argue: sub-passage rolling-hash dedup, 13-gram
decontamination, banded MinHash LSH, exact dedup, brute-force cosine
top-k (the quadratic oracle baseline — expected to grow FASTER than
data), and the sliding-window streaming pair.

Prints one JSON line; paste the per-decade ratios into SURVEY §8.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DEFAULT = [
    "subpassage_dedup_rewrite",
    "contamination_13gram",
    "minhash_lsh_near_dup",
    "exact_dedup_documents",
    "cosine_topk_bruteforce",
    "streaming_sliding_counts",
    "streaming_sliding_counts_append",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT

    from bench import _timed
    from currency_etl_pipeline_spark.queries import all_queries
    from currency_etl_pipeline_spark.session import get_spark

    spark = get_spark("scaling_curve")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    out: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        secs = [_timed(lambda: spec.spark(spark, sf)) for sf in SFS]
        ratios = [round(b / a, 2) if a else None for a, b in zip(secs, secs[1:])]
        out[name] = {"sec": secs, "decade_ratios": ratios}
    print(json.dumps({"sfs": SFS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
