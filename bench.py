"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Each query is fully materialized via the noop sink (no driver collect,
no disk write — pure engine throughput).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "latest_rate_per_key",
    "current_snapshot_upsert",
    "top1000_newest_events",
    "trailing_24h_delta",
    "pct_change_per_event",
    "tpch_q1_pricing_summary",
    "revenue_by_region",
    "customer_order_stats",
    "asof_last_purchase_before_click",
    "exact_dedup_documents",
    "near_dup_jaccard_pairs",
    "minhash_lsh_near_dup",
    "simhash_near_dup",
    "token_stats",
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "ivf_ann_topk",
    "tpch_q3_shipping_priority",
    "lineitem_corr_moments",
    "event_sessionization",
    "lineitem_percentiles",
    # round 3 additions (new entries appended so per-query numbers stay
    # comparable across BENCH_r* rounds):
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "near_dup_embeddings_lsh",
    "purchases_within_1h_before_click",
    # round 4 additions (appended; the 25 rows above stay byte-identical
    # so BENCH_r4-vs-r3 is like-for-like on the shared prefix):
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_suppliers",
    "tfidf_top_terms",
    "sequence_packing",
    "doc_repetition_score",
    "ngram_contamination",
    "embedding_dedup_clusters",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from currency_etl_pipeline_spark.session import get_spark
    from currency_etl_pipeline_spark.queries import all_queries

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = specs[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm: JIT + parquet footer cache
        best = float("inf")
        for _ in range(2):  # min-of-2: measure the engine, not host noise
            t0 = time.perf_counter()
            df = specs[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
