"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check at sf0.001.
queries()      — every implemented operator from SURVEY.md §2 as a
                 named (spark, sf_dir) -> DataFrame callable.
oracle_sql()   — DuckDB twins for the SQL-expressible ones.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's dashboard brain in one plan — the
    current_rates snapshot (newest-wins per pair key) joined with the
    trailing-24h delta (diff / pct / direction). SURVEY.md §7 Phase 0.
    """
    from currency_etl_pipeline_spark.session import tune_for_local
    from currency_etl_pipeline_spark.operators.delta import window_delta
    from currency_etl_pipeline_spark.operators.upsert import latest_per_key
    from currency_etl_pipeline_spark.functions.scalars import ts_str
    from currency_etl_pipeline_spark.queries.registry import ANCHOR
    from currency_etl_pipeline_spark.tables import load_table
    from pyspark.sql import functions as F

    tune_for_local(spark)
    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events")
    keys = ["user_id", "event_type"]
    snap = latest_per_key(ev, keys, "ts", tie_breakers=["event_id"]).select(
        "user_id", "event_type", F.col("value").alias("rate"), ts_str("ts").alias("ts_utc")
    )
    delta = window_delta(ev, keys, "ts", "value", anchor=ANCHOR, lookback_hours=24)
    return snap.join(delta, keys, "left")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Catalog in the driver's adaptive sweep order: failed-or-never-checked
    queries first, then least-recently-checked, so the bounded correctness
    prefix rotates across rounds (registry.ordered_names)."""
    from currency_etl_pipeline_spark.queries import all_queries
    from currency_etl_pipeline_spark.queries.registry import ordered_names

    specs = all_queries()
    return {name: specs[name].spark for name in ordered_names()}


def oracle_sql() -> dict[str, str]:
    from currency_etl_pipeline_spark.queries import all_oracles

    return all_oracles()
