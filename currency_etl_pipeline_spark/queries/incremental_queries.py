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


# Co-moment maintenance scenario over the lineitem "snapshot": v1 =
# lines shipped before the cutoff; v2 = the full table after (a)
# post-cutoff lines arrive (inserts), (b) a quantity correction lands
# on every 11th part's lines (updates), (c) a modulo order purge
# (deletes). Grouped by returnflag; (qty, price) co-moments maintained.
_CM_CUTOFF = "1998-01-01"
_CM_PURGE, _CM_BUMP = 97, 11

_CM_ORACLE = f"""
    WITH v2 AS (
        SELECT l_returnflag,
               l_quantity + CASE WHEN l_partkey % {_CM_BUMP} = 0 THEN 5 ELSE 0 END AS x,
               l_extendedprice AS y
        FROM lineitem WHERE l_orderkey % {_CM_PURGE} != 0
    ),
    p AS (
        SELECT l_returnflag, count(*) AS n,
               sum(CAST(x AS DECIMAL(28,4))) AS sx,
               sum(CAST(y AS DECIMAL(28,4))) AS sy,
               -- DECIMAL(19,4): width > 18 routes DuckDB's multiply through
               -- int128 (the width-18 path overflows int64 on price^2);
               -- the product values are exact either way, matching Spark's
               -- (18,4) x (18,4) form bit-for-bit.
               sum(CAST(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS sxx,
               sum(CAST(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS syy,
               sum(CAST(CAST(x AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS sxy
        FROM v2 GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(CAST(sx AS DOUBLE), 4) AS sum_qty,
           round(CAST(sy AS DOUBLE), 4) AS sum_price,
           round(CASE
               WHEN (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
               THEN NULL
               ELSE (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END, 6) AS corr_qty_price
    FROM p
"""


@query("cdc_comoment_rollup", oracle=_CM_ORACLE)
def cdc_comoment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CO-MOMENT maintenance: per-returnflag
    (n, Σx, Σy, Σx², Σy², Σxy) over (quantity, price) maintained from
    a CDC feed — the rollup of the pre-cutoff snapshot plus
    ``delta_apply_comoments(snapshot_diff(v1, v2))`` must equal the
    from-scratch co-moments of v2, closing variance/covariance/
    CORRELATION under inserts (post-cutoff lines), updates (a
    quantity correction on every 11th part), and deletes (an order
    purge). The ORACLE recomputes v2 and derives the same rounded
    correlation from the identical DECIMAL partials, so the driver
    hash-checks that incremental co-moments are exact, not just close.

    Scale: the maintained path touches |changes| CDC rows and the
    |groups| rollup; the snapshot is never re-read (the delta-apply
    contract). Correlation is derived at the OUTPUT EDGE from exact
    partials — both engines divide the same doubles, so parity holds
    without fixed-point tricks on the ratio itself.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_returnflag",
        "l_quantity", "l_extendedprice", "l_shipdate",
    )
    bump = F.when(F.col("l_partkey") % _CM_BUMP == 0, F.lit(5.0)).otherwise(F.lit(0.0))
    v1 = li.filter(F.col("l_shipdate") < F.to_timestamp(F.lit(_CM_CUTOFF)))
    v2 = li.filter(F.col("l_orderkey") % _CM_PURGE != 0).withColumn(
        "l_quantity", F.col("l_quantity") + bump
    )
    from currency_etl_pipeline_spark.operators.incremental import (
        comoment_rollup,
        delta_apply_comoments,
    )

    prev = comoment_rollup(v1, ["l_returnflag"], "l_quantity", "l_extendedprice")
    # Snapshot key: (orderkey, linenumber) is NOT unique in the
    # synthetic lineitem; the full physical line identity including
    # shipdate is (verified at every SF) — snapshot_diff requires it.
    cdc = snapshot_diff(
        v1,
        v2,
        ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_shipdate"],
    ).localCheckpoint(eager=True)
    m = delta_apply_comoments(
        prev, cdc, ["l_returnflag"], "l_quantity", "l_extendedprice"
    )
    n = F.col("n")
    sx, sy = F.col("sum_x").cast("double"), F.col("sum_y").cast("double")
    sxx, syy, sxy = (
        F.col("sum_xx").cast("double"),
        F.col("sum_yy").cast("double"),
        F.col("sum_xy").cast("double"),
    )
    var_term = (n * sxx - sx * sx) * (n * syy - sy * sy)
    corr = F.when(var_term <= 0, F.lit(None)).otherwise(
        (n * sxy - sx * sy) / F.sqrt(var_term)
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(sx, 4).alias("sum_qty"),
        F.round(sy, 4).alias("sum_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


# Distinct-maintenance scenario: the same v1→v2 CDC, maintaining the
# per-event-type count of distinct VALUE BUCKETS (floor(value) — many
# users share a bucket, so multiplicities exceed 1 and deletes must
# decrement witnesses without losing still-supported buckets).
# Threshold 25 splits the sf0.01 groups 2 False / 3 True so the
# resketch flag is exercised in both directions by the driver sweep.
_DISTINCT_RESKETCH_AT = 25

_DISTINCT_ORACLE = f"""
    WITH v2 AS (
        SELECT user_id, event_type, "value"
        FROM events
        WHERE user_id % {_PURGE_MOD} != 0
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) = 1
    )
    SELECT event_type,
           count(DISTINCT CAST(floor("value") AS BIGINT)) AS n_distinct,
           count(DISTINCT CAST(floor("value") AS BIGINT))
               > {_DISTINCT_RESKETCH_AT} AS resketch
    FROM v2 GROUP BY event_type
"""


@query("cdc_distinct_maintenance", oracle=_DISTINCT_ORACLE)
def cdc_distinct_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-aware EXACT distinct-count maintenance (VERDICT r6 task
    7): per event type, the number of distinct floor(value) buckets
    among users' latest states, maintained across the v1→v2 CDC feed
    via the support multiset — per (event_type, bucket) the COUNT of
    witnessing users, which inserts increment, deletes decrement, and
    updates move (between buckets AND between event types). A bucket
    drops out exactly when its last witness does, which a retractionless
    HLL register can never express. The ORACLE is the from-scratch
    COUNT(DISTINCT) over v2, so the driver hash-checks maintained ≡
    recompute; ``resketch`` is the hybrid-policy flag (support grown
    past taste → demote this group to a merged sketch + re-sketch
    cadence).

    Scale: the maintained path touches the |changes| CDC rows and the
    |support| relation (Σ per-group distinct buckets — the answer
    domain, not the snapshot). Multiplicities are integers: incremental
    ≡ recompute is exact with no DECIMAL machinery.
    """
    from currency_etl_pipeline_spark.operators.incremental import (
        delta_apply_distinct,
        distinct_count_report,
        distinct_support,
    )

    v1, v2 = _snapshots(spark, sf_dir)
    bucket = F.floor("value").cast("long").alias("value_bucket")
    v1b = v1.select("user_id", "event_type", bucket)
    v2b = v2.select("user_id", "event_type", bucket)
    prev = distinct_support(v1b, ["event_type"], "value_bucket")
    cdc = snapshot_diff(v1b, v2b, ["user_id"]).localCheckpoint(eager=True)
    support = delta_apply_distinct(prev, cdc, ["event_type"], "value_bucket")
    return distinct_count_report(
        support, ["event_type"], resketch_threshold=_DISTINCT_RESKETCH_AT
    )
