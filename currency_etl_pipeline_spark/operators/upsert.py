"""Newest-wins snapshot maintenance — the reference's MERGE, Spark-first.

Reference semantics (load_to_bigquery.py:98-111):

    MERGE current_rates T USING tmp_rates S
      ON T.base_currency = S.base_currency AND T.target_currency = S.target_currency
    WHEN MATCHED AND S.timestamp > T.timestamp THEN UPDATE ...
    WHEN NOT MATCHED THEN INSERT ...

i.e. an upsert where an update only lands if STRICTLY newer — equal
timestamps keep the existing row (the reference's only late/duplicate
data defense; we preserve it exactly).

Spark-first rewrite (no Delta dependency): tag current rows with
priority 1 and update rows with priority 0, union, and keep the first
row per key ordered by (ts DESC, priority DESC, tie_breakers DESC).
Ties on ts resolve to the current row — exactly the strict-> rule.

Scale notes (100 TB): this is ONE hash shuffle on the snapshot key —
the same cost as any engine's MERGE — and the window is evaluated
with partial ordering inside each hash partition (no global sort).
Snapshot tables are latest-per-key, so they're orders of magnitude
smaller than the event log; the union is dominated by the update
batch scan. With AQE on, skewed keys split automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PRIO = "__upsert_priority"
_RN = "__upsert_rn"


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """One row per key: the newest by ts_col (deterministic via tie_breakers).

    The reference materializes this as the ``current_rates`` table; as a
    query it's the classic argmax-per-group (T1/T5 generalized per key).
    """
    order: list[Column] = [F.col(ts_col).desc()]
    order += [F.col(t).desc() for t in tie_breakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def upsert_newest_wins(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """MERGE rewrite: newest-wins upsert where equal timestamps keep current.

    ``current`` must already be unique per key (a snapshot); ``updates``
    may contain many rows per key (they're deduped to their own newest
    first, using tie_breakers for determinism).

    Returns the new snapshot with ``current``'s column order.
    """
    cols = current.columns
    updates_latest = latest_per_key(updates.select(*cols), keys, ts_col, tie_breakers)

    tagged = current.withColumn(_PRIO, F.lit(1)).unionByName(
        updates_latest.withColumn(_PRIO, F.lit(0))
    )
    # ts DESC first, then priority DESC: strictly-newer update wins;
    # equal-ts resolves to current (priority 1) — the MERGE's `S.ts > T.ts`.
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc(), F.col(_PRIO).desc())
    return (
        tagged.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .select(*cols)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """CDC view between two snapshots of the same keyed table: one row
    per key whose state changed, with ``change_type`` in
    (insert, update, delete) and the full old/new value structs.

    Both inputs must be unique per key (snapshots — what SnapshotStore
    versions hold by construction). The comparison is a null-safe
    struct equality over every non-key column, so a column flipping to
    or from NULL registers as an update.

    Plan: ONE full-outer shuffle join on the keys, then a codegen
    filter dropping unchanged rows — |old| + |new| narrow rows, no
    window, no second pass. At 100 TB snapshot scale this is the
    standard "what changed between version A and B" incremental-feed
    primitive a downstream consumer polls instead of re-reading the
    snapshot.
    """
    keys = list(keys)
    if set(old.columns) != set(new.columns):
        # Versions can legally carry different schemas (SnapshotStore
        # accepts any DataFrame per commit); comparing only the
        # intersection would silently drop changes in the missing
        # columns from the CDC feed, and selecting new-only columns
        # from old would throw an opaque AnalysisException. Fail with
        # the actual drift instead.
        raise ValueError(
            "snapshot_diff requires identical column sets; "
            f"old-only={sorted(set(old.columns) - set(new.columns))}, "
            f"new-only={sorted(set(new.columns) - set(old.columns))}"
        )
    val_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*val_cols).alias("_old"))
    n = new.select(*keys, F.struct(*val_cols).alias("_new"))
    return (
        o.join(n, keys, "full_outer")
        .filter(~F.col("_old").eqNullSafe(F.col("_new")))
        .select(
            *keys,
            F.when(F.col("_old").isNull(), F.lit("insert"))
            .when(F.col("_new").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
            F.col("_old").alias("old"),
            F.col("_new").alias("new"),
        )
    )
