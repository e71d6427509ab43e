"""operators/incremental.py: CDC delta-apply == full recompute, across
multi-commit SnapshotStore histories (seeded-random property test) and
the group-migration / zero-count edge cases."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from currency_etl_pipeline_spark.operators.incremental import (
    algebraic_rollup,
    delta_apply_rollup,
)
from currency_etl_pipeline_spark.operators.upsert import snapshot_diff
from currency_etl_pipeline_spark.sources.warehouse import SnapshotStore

_SCHEMA = "k bigint, grp string, x double"


def _rollup_rows(df):
    return sorted(
        (r["grp"], r["n"], str(r["sum_x"]), str(r["sum_x2"]))
        for r in df.collect()
    )


def _random_snapshot(rng, keys):
    groups = ["a", "b", "c"]
    return [
        (k, rng.choice(groups), round(rng.uniform(-50, 50), 2)) for k in sorted(keys)
    ]


def test_multi_commit_delta_apply_equals_recompute(spark, tmp_path):
    """Across a random 6-commit history (keys churn in and out, groups
    migrate, values change), the rollup maintained purely from
    SnapshotStore.diff CDC feeds must equal the from-scratch rollup of
    every committed version, bit-for-bit (DECIMAL partials)."""
    rng = random.Random(20260814)
    store = SnapshotStore(spark, str(tmp_path / "snap"), retain=10)

    universe = list(range(40))
    keys = set(rng.sample(universe, 25))
    store.commit(spark.createDataFrame(_random_snapshot(rng, keys), _SCHEMA))
    maintained = algebraic_rollup(store.read(), ["grp"], "x")

    for step in range(5):
        # churn: drop some keys, add some, rewrite some values
        keys -= set(rng.sample(sorted(keys), rng.randint(1, 6)))
        keys |= set(rng.sample(universe, rng.randint(1, 6)))
        store.commit(spark.createDataFrame(_random_snapshot(rng, keys), _SCHEMA))
        v = store.version()
        cdc = store.diff(v - 1, v, ["k"])
        maintained = delta_apply_rollup(maintained, cdc, ["grp"], "x")
        # pin the lineage so the next iteration doesn't replay the chain
        maintained = spark.createDataFrame(
            maintained.collect(), maintained.schema
        )
        assert _rollup_rows(maintained) == _rollup_rows(
            algebraic_rollup(store.read(), ["grp"], "x")
        ), f"diverged from recompute at commit {step + 2}"


def test_delta_apply_drops_emptied_group_and_handles_migration(spark):
    """A group whose last row is deleted disappears (matching groupBy
    semantics), and an update that moves a row between groups lands as
    -1/+1 on the two groups."""
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)], _SCHEMA
    )
    # key 3's group b empties; key 2 migrates a -> c; key 4 inserts into c
    v2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "c", 20.0), (4, "c", 7.0)], _SCHEMA
    )
    out = delta_apply_rollup(
        algebraic_rollup(v1, ["grp"], "x"), snapshot_diff(v1, v2, ["k"]), ["grp"], "x"
    )
    assert _rollup_rows(out) == _rollup_rows(algebraic_rollup(v2, ["grp"], "x"))
    got = {r["grp"]: r["n"] for r in out.collect()}
    assert got == {"a": 1, "c": 2}, got


def test_delta_apply_empty_cdc_is_identity(spark):
    v1 = spark.createDataFrame([(1, "a", 1.5), (2, "b", -2.0)], _SCHEMA)
    prev = algebraic_rollup(v1, ["grp"], "x")
    out = delta_apply_rollup(prev, snapshot_diff(v1, v1, ["k"]), ["grp"], "x")
    assert _rollup_rows(out) == _rollup_rows(prev)
