"""Incremental-view-maintenance catalog queries: CDC deltas applied to
maintained aggregates (operators/incremental.py) — the consumer side of
`SnapshotStore.diff`, which previously fed nothing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.operators.incremental import (
    algebraic_rollup,
    delta_apply_rollup,
)
from currency_etl_pipeline_spark.operators.upsert import latest_per_key, snapshot_diff
from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.tables import load_table

# Snapshot v1 = per-user latest event state as of the cutoff; v2 = the
# same snapshot after (a) replaying the remaining event stream and
# (b) purging users user_id % 97 == 0 (a right-to-be-forgotten pass).
# The diff therefore carries ALL THREE change types: inserts (users
# first active after the cutoff — it sits inside the fixture's initial
# user-arrival ramp, unlike the day-30 ANCHOR), updates (users whose
# latest event advanced — including event_type changes, i.e. GROUP
# MIGRATION in the maintained rollup), and deletes (purged users).
_PURGE_MOD = 97
_CUTOFF = "2024-01-01 06:00:00"


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts", "event_id"
    )
    v1 = latest_per_key(
        ev.filter(F.col("ts") < F.to_timestamp(F.lit(_CUTOFF))),
        ["user_id"],
        "ts",
        tie_breakers=("event_id",),
    )
    v2 = latest_per_key(ev, ["user_id"], "ts", tie_breakers=("event_id",)).filter(
        F.col("user_id") % _PURGE_MOD != 0
    )
    return v1.drop("event_id"), v2.drop("event_id")


_CDC_ORACLE = f"""
    WITH v2 AS (
        SELECT user_id, event_type, "value"
        FROM events
        WHERE user_id % {_PURGE_MOD} != 0
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) = 1
    )
    SELECT event_type,
           count(*) AS n,
           round(CAST(sum(CAST("value" AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_value,
           round(CAST(sum(CAST(
               CAST("value" AS DECIMAL(18,4)) * CAST("value" AS DECIMAL(18,4))
               AS DECIMAL(38,8))) AS DOUBLE), 4) AS sum_sq,
           round(CAST(sum(CAST("value" AS DECIMAL(28,4))) AS DOUBLE)
                 / count(*), 6) AS avg_value
    FROM v2 GROUP BY event_type
"""


@query("cdc_delta_apply_rollup", oracle=_CDC_ORACLE)
def cdc_delta_apply_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a per-event-type (n, Σx, Σx²) rollup
    from a CDC feed: the rollup of snapshot v1 plus
    ``delta_apply_rollup(snapshot_diff(v1, v2))`` must equal — and the
    ORACLE computes — the from-scratch rollup of v2. The scenario
    exercises every change type: post-cutoff activity inserts and
    updates users (updates include event-type changes, so rows migrate
    between groups), and a modulo purge deletes users.

    Scale: the maintained path never re-reads the snapshot — it
    touches the |changes| CDC rows and the |groups| rollup only. At
    100 TB snapshot / per-commit change rates of 10⁻³, that is a
    thousandfold less IO per commit than recompute, with EXACT
    equality guaranteed by DECIMAL partials (the dec() discipline).
    The test-scale inputs here derive both versions from one events
    scan each; production versions come from SnapshotStore commits.
    """
    v1, v2 = _snapshots(spark, sf_dir)
    prev = algebraic_rollup(v1, ["event_type"], "value")
    cdc = snapshot_diff(v1, v2, ["user_id"])
    maintained = delta_apply_rollup(prev, cdc, ["event_type"], "value")
    return maintained.select(
        "event_type",
        "n",
        F.round(F.col("sum_x").cast("double"), 4).alias("sum_value"),
        F.round(F.col("sum_x2").cast("double"), 4).alias("sum_sq"),
        F.round((F.col("sum_x").cast("double") / F.col("n")), 6).alias("avg_value"),
    )
