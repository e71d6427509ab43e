"""Adjudicate `dedup_consensus` under the hunt protocol (VERDICT r13
task 2): the one r13 row whose elevated driver read (5.80 calibrated)
AGREED with both in-sequence hunt twins (4.20/5.09) while the builder's
final record read 1.94 — so unlike every other spike it reproduces
in-sequence, and position-dependent state is the suspect.

Protocol: ONE long-lived JVM, three measurements of the same query
with different PREDECESSOR sets, each bracketed by the fixed
calibration probe:

  A. original neighborhood — the 13 queries that precede
     dedup_consensus in bench.py HEADLINE order (the heavy
     pandas-UDF / shard-prep / n-gram block) run first, then
     dedup_consensus timed exactly as bench.py times it;
  B. permuted neighborhood — 13 UNRELATED light relational queries
     (TPC-H block) run instead, then dedup_consensus re-timed;
  C. quiet re-measure — nothing run since B except the probe.

If A >> B (calibrated), the predecessor set is the mechanism (state:
fixture cache eviction, Python-worker pool churn, JIT deopt). If
A ≈ B ≈ C but all >> the r13 builder record's 1.94 calibrated, the
elevation is position-independent and intrinsic to this epoch's JVM —
recorded, not fixed. Output: JSONL to stdout + tools/hunt_<tag>.jsonl.

Usage: python tools/consensus_hunt.py [tag]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

BENCH_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# bench.py HEADLINE order: the block immediately preceding dedup_consensus.
ORIGINAL_NEIGHBORS = [
    "user_gap_stats",
    "scalar_pandas_udf_tokens",
    "udtf_user_activity_profile",
    "pandas_udaf_median_value",
    "media_image_stats",
    "cross_split_near_dup_leakage",
    "training_shard_prep",
    "train_val_test_split",
    "quality_filter",
    "lang_id_ngram",
    "bpe_token_estimate",
    "doc_fingerprint",
    "corpus_ngram_topk",
]
# Light, unrelated relational queries — no documents/embeddings tables,
# no Python workers, no persisted state.
PERMUTED_NEIGHBORS = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_trade_volume",
    "tpch_q10_returned_items",
    "tpch_q12_priority_by_flag",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "revenue_by_region",
    "customer_order_stats",
    "daily_event_rollup",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "consensus_r14"
    log_fh = open(os.path.join(HERE, f"hunt_{tag}.jsonl"), "w")

    def emit(kind: str, **kw) -> None:
        rec = {"t": round(time.time(), 1), "kind": kind, **kw}
        line = json.dumps(rec)
        print(line, flush=True)
        log_fh.write(line + "\n")
        log_fh.flush()

    from bench import _calibration_df, _timed
    from currency_etl_pipeline_spark.queries import all_queries
    from currency_etl_pipeline_spark.session import get_spark

    spark = get_spark("consensus-hunt")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    def probe() -> float:
        return _timed(lambda: _calibration_df(spark, BENCH_SF), warm=False)

    def run_block(names: list[str], label: str) -> None:
        for name in names:
            sec = _timed(lambda: specs[name].spark(spark, BENCH_SF))
            emit("neighbor", phase=label, name=name, sec=sec)

    def measure(label: str) -> None:
        cal = probe()
        sec = _timed(lambda: specs["dedup_consensus"].spark(spark, BENCH_SF))
        emit(
            "consensus",
            phase=label,
            sec=sec,
            calibration=cal,
            calibrated=round(sec / cal, 2) if cal else None,
        )

    emit("start", calibration=probe())
    run_block(ORIGINAL_NEIGHBORS, "A_original")
    measure("A_original")
    run_block(PERMUTED_NEIGHBORS, "B_permuted")
    measure("B_permuted")
    measure("C_quiet")
    emit("end", calibration=probe())
    log_fh.close()


if __name__ == "__main__":
    main()
