"""Time-window deltas — the reference's 24h-change computation, one-pass.

The reference runs TWO separate BigQuery queries (latest, oldest-in-24h:
fetch_transform_load_dag.py:111-137) and subtracts in Python. Here it's
one scan + one shuffle: groupBy key with max_by/min_by over the
window-filtered rows, then pure column math (diff, pct with
zero-division guard, 3-way direction CASE — F9/F10).

``pct_change_over_key`` is the per-row generalization (lag over an
ordered key window) for "historical trends" (README.md:104-110).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.functions.scalars import direction_expr, pct_change_expr


def window_delta(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    anchor: str,
    lookback_hours: int = 24,
) -> DataFrame:
    """Per-key (latest, earliest, diff, pct_change, direction) within
    [anchor - lookback, anchor].

    ``anchor`` is an explicit literal timestamp, not now() — oracle
    parity rule 1 and the fix for the reference's wall-clock coupling.
    """
    lo = F.to_timestamp(F.lit(anchor)) - F.expr(f"INTERVAL {lookback_hours} HOURS")
    hi = F.to_timestamp(F.lit(anchor))
    in_window = df.filter((F.col(ts_col) >= lo) & (F.col(ts_col) <= hi))
    agg = in_window.groupBy(*keys).agg(
        F.max_by(value_col, ts_col).alias("latest_value"),
        F.min_by(value_col, ts_col).alias("earliest_value"),
        F.max(ts_col).alias("latest_ts"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    diff = F.col("latest_value") - F.col("earliest_value")
    return agg.select(
        *keys,
        F.round("latest_value", 6).alias("latest_value"),
        F.round("earliest_value", 6).alias("earliest_value"),
        F.round(diff, 6).alias("diff"),
        F.round(pct_change_expr(F.col("latest_value"), F.col("earliest_value")), 6).alias("pct_change"),
        direction_expr(diff).alias("direction"),
        F.col("n_obs"),
    )


def pct_change_over_key(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Per-row pct change vs previous observation of the same key (lag)."""
    order = [F.col(ts_col).asc()] + [F.col(t).asc() for t in tie_breakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(value_col).over(w)
    return (
        df.withColumn("prev_value", prev)
        .filter(F.col("prev_value").isNotNull())
        .withColumn("pct_change", F.round(pct_change_expr(F.col(value_col), F.col("prev_value")), 6))
    )
