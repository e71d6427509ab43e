"""Physical-plan regression tests — the 100 TB properties.

Correctness tests prove the answers; these prove the PLANS stay the
shape that survives scale-up: filters reach the parquet scan, small
dims broadcast, identical self-join sides share one exchange, bucketed
joins skip the shuffle entirely, and the partitioned warehouse prunes
partitions. A refactor that silently regresses one of these still
passes every oracle check — only these tests catch it.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.queries import all_queries
from currency_etl_pipeline_spark.tables import load_table

SPECS = all_queries()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def executed_plan_of(df) -> str:
    # Materialize so AQE finalizes, then read the executed plan.
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_filters_reach_scans(spark, sf_dir):
    plan = plan_of(SPECS["tpch_q3_shipping_priority"].spark(spark, sf_dir))
    assert "GreaterThan(l_shipdate" in plan, "lineitem date filter not pushed to scan"
    assert "LessThan(o_orderdate" in plan, "orders date filter not pushed to scan"
    assert "TakeOrderedAndProject" in plan, "top-10 should be a top-k, not a global sort"


def test_q3_prunes_columns(spark, sf_dir):
    plan = plan_of(SPECS["tpch_q3_shipping_priority"].spark(spark, sf_dir))
    li_schemas = re.findall(r"ReadSchema: struct<(l_[^>]*)>", plan)
    assert li_schemas, "no lineitem scan found"
    for s in li_schemas:
        cols = {c.split(":")[0] for c in s.split(",")}
        assert cols <= {"l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"}, (
            f"lineitem scan reads more than the query needs: {cols}"
        )


def test_revenue_by_region_broadcasts_dims(spark, sf_dir):
    plan = plan_of(SPECS["revenue_by_region"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "dim joins should broadcast, not shuffle"


def test_jaccard_shares_one_shingle_subtree(spark, sf_dir):
    """The self-join sides are identical plans; the expensive shingle
    pipeline must be planned once (ReusedExchange) or at most twice
    (broadcast build), never once per downstream branch."""
    plan = executed_plan_of(SPECS["near_dup_jaccard_pairs"].spark(spark, sf_dir))
    n_generates = plan.count("Generate explode")
    assert n_generates <= 2, f"shingle explode planned {n_generates} times"


def test_point_lookup_is_topk_not_sort(spark, sf_dir):
    plan = plan_of(SPECS["point_lookup_latest"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    from currency_etl_pipeline_spark.sources.bucketed import bucketed_join, write_bucketed

    # (managed tables land in the session's spark-warehouse dir; DROP
    # TABLE in the finally deletes the data too)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "orders_b", ["o_orderkey"], num_buckets=4)
    write_bucketed(li, "lineitem_b", ["o_orderkey"], num_buckets=4)
    # At test scale the optimizer rightly broadcasts instead (bucketing
    # is "disabled by query planner"); force the big-table regime the
    # feature exists for.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", ["o_orderkey"])
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
        assert "Bucketed: true" in plan
        # and it is still a correct join
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_historical_partition_pruning(spark, tmp_path):
    from currency_etl_pipeline_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh2"))
    batch = spark.createDataFrame(
        [("USD", "EGP", 47.6, d, d) for d in ["2024-01-01 10:00:00", "2024-01-02 10:00:00", "2024-01-03 10:00:00"]],
        "base_currency string, target_currency string, rate double, timestamp string, retrieved_at string",
    ).withColumn("timestamp", F.to_timestamp("timestamp")).withColumn("retrieved_at", F.to_timestamp("retrieved_at"))
    wh.append_historical(batch)
    pruned = spark.read.parquet(wh.historical_path).filter(F.col("rate_date") == "2024-01-02")
    plan = plan_of(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "rate_date" in m.group(1), "date filter did not become a partition filter"
    assert pruned.count() == 1


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A dim-side filter must prune fact partitions at RUNTIME (DPP):
    the fact scan's PartitionFilters carries a dynamicpruning subquery
    fed by the dim. At 100 TB this is the difference between scanning
    one day and scanning the whole history when the cut is only known
    via a join."""
    ev = load_table(spark, sf_dir, "events")
    fact_path, dim_path = str(tmp_path / "fact"), str(tmp_path / "dim")
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy("event_date").parquet(fact_path)
    (
        ev.select(F.to_date("ts").alias("event_date")).distinct()
        .withColumn("flag", F.dayofmonth("event_date"))
        .write.parquet(dim_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("flag") == 5)
    joined = fact.join(dim, "event_date")
    plan = plan_of(joined)
    assert "dynamicpruningexpression" in plan, "no runtime partition pruning in fact scan"
    assert joined.count() > 0
