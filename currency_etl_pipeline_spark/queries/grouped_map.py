"""Grouped-map pandas transforms (applyInPandas) — the §2.J surface.

The reference's per-pair logic is pandas-in-a-task (fetch.py,
transform.py); the distributed generalization is applyInPandas: the
engine shuffles each group to one executor and hands it over as a
pandas DataFrame via Arrow. Use it ONLY when the per-group logic truly
needs imperative pandas (here: order-statistics over per-group
sequences); everything expressible as built-ins stays JVM-side.

Oracle-parity: the gap statistics are computed over integer
microsecond deltas — order statistics on exact integers, so pandas and
DuckDB agree bit-for-bit (no float accumulation anywhere).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.tables import load_table

GAP_SCHEMA = (
    "user_id long, n_events long, n_gaps long, median_gap_us double, max_gap_us double"
)


def _gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    # exact integer microseconds; median of ints is exact (or a .5
    # midpoint). Normalize the unit explicitly — pandas may hold
    # datetime64[ns] or [us] depending on the Arrow path.
    us = pdf["ts"].astype("datetime64[us]").astype("int64")
    gaps = us.diff().dropna()
    if len(gaps) == 0:
        med = mx = None
    else:
        # Keep exact: integer micros, or an n.5 midpoint for even-count
        # medians — both exactly representable in float64. No division,
        # no rounding, so no cross-engine tie-breaking to disagree on.
        med = float(gaps.median())
        mx = float(gaps.max())
    return pd.DataFrame(
        [
            {
                "user_id": int(pdf["user_id"].iloc[0]),
                "n_events": len(pdf),
                "n_gaps": len(gaps),
                "median_gap_us": med,
                "max_gap_us": mx,
            }
        ]
    )


@query(
    "user_gap_stats",
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT user_id,
           count(*) AS n_events,
           count(gap_us) AS n_gaps,
           CAST(median(gap_us) AS DOUBLE) AS median_gap_us,
           CAST(max(gap_us) AS DOUBLE) AS max_gap_us
    FROM g GROUP BY user_id
    """,
)
def user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event-gap order statistics (median/max gap in
    exact microseconds) via grouped-map ``applyInPandas`` — each user's event
    sequence arrives as one Arrow-backed pandas frame.

    Plan: ONE shuffle on user_id, then per-group vectorized pandas.
    State is bounded by the largest single group — at 100 TB a hot user
    is the risk, which is why everything that doesn't need sequence
    order (the agg families) stays JVM-side; this operator exists for
    logic that genuinely wants an ordered per-key array in Python.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return ev.groupBy("user_id").applyInPandas(_gap_stats, GAP_SCHEMA)
