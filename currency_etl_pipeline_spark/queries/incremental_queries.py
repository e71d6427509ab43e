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
    # The CDC feed is |changed keys| rows — bounded. localCheckpoint
    # materializes it once so the downstream plan consumes a feed, not
    # a re-derivation of both snapshot versions per reference (which is
    # also the production IO profile: the feed arrives materialized).
    cdc = snapshot_diff(v1, v2, ["user_id"]).localCheckpoint(eager=True)
    maintained = delta_apply_rollup(prev, cdc, ["event_type"], "value")
    return maintained.select(
        "event_type",
        "n",
        F.round(F.col("sum_x").cast("double"), 4).alias("sum_value"),
        F.round(F.col("sum_x2").cast("double"), 4).alias("sum_sq"),
        F.round((F.col("sum_x").cast("double") / F.col("n")), 6).alias("avg_value"),
    )


# Dim churn for the join-view refresh: every 13th customer's segment
# flips to CHURNED (update), every 17th is purged (delete). Inserts
# contribute nothing to an inner view until facts arrive, so the two
# visible change classes are what the scenario exercises.
_JV_CHURN, _JV_PURGE = 13, 17

_JV_ORACLE = f"""
    WITH v2 AS (
        SELECT c_custkey AS custkey, c_name,
               CASE WHEN c_custkey % {_JV_CHURN} = 0 THEN 'CHURNED'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer
        WHERE c_custkey % {_JV_PURGE} != 0
    )
    SELECT o.o_orderkey, v.custkey, o.o_totalprice, v.c_name, v.c_mktsegment
    FROM orders o JOIN v2 v ON o.o_custkey = v.custkey
"""


@query("cdc_join_view_refresh", oracle=_JV_ORACLE)
def cdc_join_view_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a denormalized orders⋈customer view
    under dim CDC: segment churn (updates) and account purges
    (deletes) arrive as a ``snapshot_diff`` feed, and
    ``refresh_join_view`` produces the new view by anti-joining the
    affected keys out and re-deriving ONLY their fact slice from the
    CDC's own new dim images — the dim is never re-read and unaffected
    view rows are never recomputed. The ORACLE is the full from-scratch
    join against the post-churn dim, so the driver hash-checks that
    incremental == recompute over all ~15k view rows.

    Scale: per refresh this touches |view| once map-side (anti join
    against the changed-key set), |facts slice| for changed keys, and
    the CDC rows — against a full recompute's fact×dim join. At a
    10⁻³ dim churn rate that is the standard three-orders-of-magnitude
    IO saving. Test-scale inputs derive v1/old_view from the same
    tables the oracle sees; production reads the MATERIALIZED view and
    a SnapshotStore commit's diff.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    v1 = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment"
    )
    v2 = v1.filter(F.col("custkey") % _JV_PURGE != 0).withColumn(
        "c_mktsegment",
        F.when(F.col("custkey") % _JV_CHURN == 0, F.lit("CHURNED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    old_view = orders.join(v1, "custkey").select(
        "o_orderkey", "custkey", "o_totalprice", "c_name", "c_mktsegment"
    )
    # Materialized once for the same reason as cdc_delta_apply_rollup:
    # the feed is bounded by changed keys, and refresh_join_view
    # references it twice (changed keys + new images).
    cdc = snapshot_diff(v1, v2, ["custkey"]).localCheckpoint(eager=True)
    from currency_etl_pipeline_spark.operators.incremental import refresh_join_view

    return refresh_join_view(old_view, orders, cdc, "custkey", ["c_name", "c_mktsegment"])
