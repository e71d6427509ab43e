"""Incremental aggregate maintenance from CDC feeds.

`SnapshotStore.diff` / `operators.upsert.snapshot_diff` produce
insert/update/delete rows between two snapshot versions; this module
CONSUMES them — the piece the round-5 review flagged missing: every
downstream aggregate used to recompute from scratch on each commit.

For ALGEBRAIC aggregates (anything expressible over commutative-group
partials: count, sum, mean, variance/stddev, co-moments) the rollup
after a commit is the rollup before it plus a signed contribution per
CDC row — the standard incremental-view-maintenance identity the
reference's MERGE load gestures at (load_to_bigquery.py:98-111 keeps
`current_rates` incremental while every consumer re-queries it).

Scale shape: the CDC feed is |changed keys| rows — at 100 TB snapshot
scale typically orders of magnitude below the snapshot — and the
maintained rollup is |groups| rows. delta_apply_rollup touches ONLY
those two relations: one explode (≤ 2 contributions per CDC row), one
|changes|-sized aggregation shuffle, one full-outer join on the group
key. The snapshot itself is never read — that is the whole point.

Holistic aggregates (exact medians) are NOT expressible this way;
their incremental forms are the sketch family (queries/stats.py
HLL/CMS) whose registers merge, or a recompute. Distinct counts get a
delete-aware EXACT path via the support-multiset device
(``distinct_support`` / ``delta_apply_distinct`` — r7, closing the gap
this paragraph used to document away), with
``distinct_count_report``'s resketch flag marking the groups where the
support state outgrows its worth and the HLL + re-sketch-cadence
fallback takes over.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.functions.scalars import dec

# DECIMAL partials: exact, associativity-independent (the dec()
# discipline), so "old rollup + deltas" lands bit-identical to a full
# recompute no matter the partitioning. Σx² needs more integer digits
# than Σx at the same scale.
_SUM_PREC, _SUM_SCALE = 28, 4
_SQ_PREC, _SQ_SCALE = 38, 8


def algebraic_rollup(
    snapshot: DataFrame, group_keys: Sequence[str], value_col: str
) -> DataFrame:
    """(n, Σx, Σx²) partials per group — the from-scratch builder whose
    output ``delta_apply_rollup`` maintains. Kept as raw partials so
    downstream can derive mean/variance/stddev without another scan;
    DECIMAL so recompute == incremental exactly.
    """
    keys = list(group_keys)
    x = dec(value_col, _SUM_PREC, _SUM_SCALE)
    x2 = dec(value_col, 18, 4)
    return snapshot.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast(f"decimal({_SUM_PREC},{_SUM_SCALE})").alias("sum_x"),
        F.sum((x2 * x2).cast(f"decimal({_SQ_PREC},{_SQ_SCALE})"))
        .cast(f"decimal({_SQ_PREC},{_SQ_SCALE})")
        .alias("sum_x2"),
    )


def delta_apply_rollup(
    prev: DataFrame | None,
    cdc: DataFrame,
    group_keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Apply a CDC feed (``snapshot_diff`` schema: keys…, change_type,
    ``old`` struct, ``new`` struct) to a maintained (n, Σx, Σx²) rollup
    WITHOUT re-reading the snapshot.

    Every CDC row contributes its old state negatively and its new
    state positively — inserts have no old side, deletes no new side,
    and an update whose GROUP KEY moved (the row migrated between
    groups) naturally splits into -1 on the old group and +1 on the
    new one, so group migration needs no special casing. Groups whose
    count reaches zero are dropped (a group exists iff it has rows —
    matching the from-scratch groupBy).

    ``group_keys``/``value_col`` may name snapshot key columns (top
    level in the CDC feed) or value columns (fields of the old/new
    structs) — resolved per side. ``prev=None`` is the cold start: the
    rollup is exactly the feed's positive contributions (a streaming
    consumer's first micro-batch, before any committed version exists).
    """
    keys = list(group_keys)
    top = set(cdc.columns) - {"change_type", "old", "new"}

    def side(sign: int, struct_col: str) -> DataFrame:
        def resolve(name: str):
            return F.col(name) if name in top else F.col(f"{struct_col}.{name}")

        return cdc.filter(F.col(struct_col).isNotNull()).select(
            *[resolve(k).alias(k) for k in keys],
            F.lit(sign).alias("_sign"),
            resolve(value_col).alias("_x"),
        )

    contrib = side(-1, "old").unionByName(side(1, "new"))
    x = dec("_x", _SUM_PREC, _SUM_SCALE)
    x2 = dec("_x", 18, 4)
    # Negate finished products, not sign*a*b: three-factor decimal
    # promotion can hit the 38-digit cap and quantize differently from
    # the from-scratch rollup's two-factor form; negation is exact.
    sq = (x2 * x2).cast(f"decimal({_SQ_PREC},{_SQ_SCALE})")
    delta = contrib.groupBy(*keys).agg(
        F.sum("_sign").alias("_dn"),
        F.sum(F.col("_sign") * x).alias("_dsum"),
        F.sum(F.when(F.col("_sign") >= 0, sq).otherwise(-sq)).alias("_dsum2"),
    )
    if prev is None:
        return delta.select(
            *keys,
            F.col("_dn").alias("n"),
            F.col("_dsum").cast(f"decimal({_SUM_PREC},{_SUM_SCALE})").alias("sum_x"),
            F.col("_dsum2").cast(f"decimal({_SQ_PREC},{_SQ_SCALE})").alias("sum_x2"),
        ).filter(F.col("n") > 0)
    zero_sum = F.lit(0).cast(f"decimal({_SUM_PREC},{_SUM_SCALE})")
    zero_sq = F.lit(0).cast(f"decimal({_SQ_PREC},{_SQ_SCALE})")
    # NULL-SAFE key equality: groupBy treats NULL as a real group, so a
    # plain equi-join would fail to line the NULL group's delta up with
    # its prev row and emit two half-merged rows. <=> matches the
    # groupBy semantics exactly.
    from functools import reduce

    cond = reduce(
        lambda a, b: a & b, [prev[k].eqNullSafe(delta[k]) for k in keys]
    )
    merged = prev.join(delta, cond, "full_outer").select(
        *[F.coalesce(prev[k], delta[k]).alias(k) for k in keys],
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))).alias("n"),
        (F.coalesce(F.col("sum_x"), zero_sum) + F.coalesce(F.col("_dsum"), zero_sum))
        .cast(f"decimal({_SUM_PREC},{_SUM_SCALE})")
        .alias("sum_x"),
        (F.coalesce(F.col("sum_x2"), zero_sq) + F.coalesce(F.col("_dsum2"), zero_sq))
        .cast(f"decimal({_SQ_PREC},{_SQ_SCALE})")
        .alias("sum_x2"),
    )
    return merged.filter(F.col("n") > 0)


def refresh_join_view(
    old_view: DataFrame,
    facts: DataFrame,
    dim_cdc: DataFrame,
    join_key: str,
    dim_cols: Sequence[str],
) -> DataFrame:
    """Maintain a denormalized fact⋈dim (inner) view under DIM CDC
    without re-running the full join — the join-view counterpart of
    ``delta_apply_rollup``, completing the incremental family (rollups,
    join views, ANN index, dedup index).

    Only rows whose dim key CHANGED can differ between the old and new
    view, so the refresh is: (1) anti-join the old view against the
    changed-key set (removes every affected row — updates AND
    deletes), then (2) re-derive the affected slice by joining the
    facts for those keys against the NEW dim images carried in the CDC
    feed itself (``new`` struct; deletes have none and thus contribute
    nothing, matching inner-join semantics). The dim table is never
    re-read, the old view is touched once, and the fact join is
    |facts-for-changed-keys|, not |facts|.

    ``join_key`` must be a shared column name across ``old_view``,
    ``facts``, and the CDC feed's key (pre-alias fact/dim keys to one
    name). No broadcast hint on the CDC sides: a routine feed is tiny
    and AQE will broadcast it, but a full-dim rewrite is dim-sized and
    must be allowed to fall back to a shuffle join (the r5 hint-sweep
    rule: never force-broadcast a side whose cardinality you don't
    bound by construction).
    """
    changed = dim_cdc.select(join_key).distinct()
    new_dim = dim_cdc.filter(F.col("new").isNotNull()).select(
        join_key, *[F.col(f"new.{c}").alias(c) for c in dim_cols]
    )
    kept = old_view.join(changed, join_key, "left_anti")
    refreshed = facts.join(new_dim, join_key).select(*old_view.columns)
    return kept.unionByName(refreshed)


def comoment_rollup(
    snapshot: DataFrame, group_keys: Sequence[str], x_col: str, y_col: str
) -> DataFrame:
    """(n, Σx, Σy, Σx², Σy², Σxy) DECIMAL partials per group — enough
    to derive mean/variance/covariance/correlation of (x, y) without
    ever re-scanning the snapshot; the co-moment counterpart of
    ``algebraic_rollup`` (the module docstring's claim that co-moments
    are algebraic, made executable)."""
    keys = list(group_keys)

    def sq(a: str, b: str):
        return (dec(a, 18, 4) * dec(b, 18, 4)).cast(f"decimal({_SQ_PREC},{_SQ_SCALE})")

    return snapshot.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(x_col, _SUM_PREC, _SUM_SCALE)).cast(f"decimal({_SUM_PREC},{_SUM_SCALE})").alias("sum_x"),
        F.sum(dec(y_col, _SUM_PREC, _SUM_SCALE)).cast(f"decimal({_SUM_PREC},{_SUM_SCALE})").alias("sum_y"),
        F.sum(sq(x_col, x_col)).cast(f"decimal({_SQ_PREC},{_SQ_SCALE})").alias("sum_xx"),
        F.sum(sq(y_col, y_col)).cast(f"decimal({_SQ_PREC},{_SQ_SCALE})").alias("sum_yy"),
        F.sum(sq(x_col, y_col)).cast(f"decimal({_SQ_PREC},{_SQ_SCALE})").alias("sum_xy"),
    )


def delta_apply_comoments(
    prev: DataFrame | None,
    cdc: DataFrame,
    group_keys: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Apply a CDC feed to a maintained co-moment rollup — identical
    signed-contribution algebra to ``delta_apply_rollup`` (old −,
    new +, group migration and zero-count drops fall out), extended to
    the five sums that close variance/covariance/correlation under
    inserts, updates, and deletes. Null-safe group-key merge for the
    same reason as the single-measure form."""
    keys = list(group_keys)
    top = set(cdc.columns) - {"change_type", "old", "new"}

    def side(sign: int, struct_col: str) -> DataFrame:
        def resolve(name: str):
            return F.col(name) if name in top else F.col(f"{struct_col}.{name}")

        return cdc.filter(F.col(struct_col).isNotNull()).select(
            *[resolve(k).alias(k) for k in keys],
            F.lit(sign).alias("_sign"),
            resolve(x_col).alias("_x"),
            resolve(y_col).alias("_y"),
        )

    contrib = side(-1, "old").unionByName(side(1, "new"))
    s = F.col("_sign")

    def sq(a: str, b: str):
        # Negate the FINISHED product, not sign*a*b: decimal precision
        # promotion over three factors can hit the 38-digit cap and
        # quantize differently from comoment_rollup's two-factor form;
        # negation is always exact.
        prod = (dec(a, 18, 4) * dec(b, 18, 4)).cast(f"decimal({_SQ_PREC},{_SQ_SCALE})")
        return F.when(s >= 0, prod).otherwise(-prod)

    delta = contrib.groupBy(*keys).agg(
        F.sum("_sign").alias("_dn"),
        F.sum(s * dec("_x", _SUM_PREC, _SUM_SCALE)).alias("_dsum_x"),
        F.sum(s * dec("_y", _SUM_PREC, _SUM_SCALE)).alias("_dsum_y"),
        F.sum(sq("_x", "_x")).alias("_dsum_xx"),
        F.sum(sq("_y", "_y")).alias("_dsum_yy"),
        F.sum(sq("_x", "_y")).alias("_dsum_xy"),
    )
    pairs = [
        ("sum_x", "_dsum_x", _SUM_PREC, _SUM_SCALE),
        ("sum_y", "_dsum_y", _SUM_PREC, _SUM_SCALE),
        ("sum_xx", "_dsum_xx", _SQ_PREC, _SQ_SCALE),
        ("sum_yy", "_dsum_yy", _SQ_PREC, _SQ_SCALE),
        ("sum_xy", "_dsum_xy", _SQ_PREC, _SQ_SCALE),
    ]
    if prev is None:
        return delta.select(
            *keys,
            F.col("_dn").alias("n"),
            *[F.col(d).cast(f"decimal({p},{sc})").alias(o) for o, d, p, sc in pairs],
        ).filter(F.col("n") > 0)
    from functools import reduce

    cond = reduce(lambda a, b: a & b, [prev[k].eqNullSafe(delta[k]) for k in keys])
    merged = prev.join(delta, cond, "full_outer").select(
        *[F.coalesce(prev[k], delta[k]).alias(k) for k in keys],
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))).alias("n"),
        *[
            (
                F.coalesce(F.col(o), F.lit(0).cast(f"decimal({p},{sc})"))
                + F.coalesce(F.col(d), F.lit(0).cast(f"decimal({p},{sc})"))
            )
            .cast(f"decimal({p},{sc})")
            .alias(o)
            for o, d, p, sc in pairs
        ],
    )
    return merged.filter(F.col("n") > 0)


def distinct_support(
    snapshot: DataFrame, group_keys: Sequence[str], key_col: str
) -> DataFrame:
    """(keys…, key_col, mult): the multiplicity relation that makes
    DISTINCT COUNT delete-aware — the gap the module docstring used to
    document away ("distinct counts are not expressible [as signed
    partials]; sketches or recompute"). True for a BARE counter: HLL
    registers cannot retract. False once the maintained state is the
    SUPPORT multiset — the standard IVM device (count-annotated
    relations, Koch-style delta processing): per (group, distinct key)
    keep how many snapshot rows witness it; the distinct count is the
    number of support rows, and a delete decrements a multiplicity
    instead of poking an irreversible register.

    State bound: |support| = Σ per-group distinct keys — the same
    quantity being counted, so the state is proportional to the ANSWER
    domain, not the snapshot. That is the honest cost of exactness
    under deletes; ``distinct_count_report``'s resketch flag marks the
    groups where it stops being worth paying.
    """
    keys = list(group_keys)
    return snapshot.groupBy(*keys, key_col).agg(F.count(F.lit(1)).alias("mult"))


def delta_apply_distinct(
    prev_support: DataFrame | None,
    cdc: DataFrame,
    group_keys: Sequence[str],
    key_col: str,
) -> DataFrame:
    """Apply a CDC feed to a maintained ``distinct_support`` relation:
    each change row contributes −1 multiplicity on its old (group, key)
    witness and +1 on its new one — inserts/deletes have one side,
    updates whose group or key moved split naturally, and a key whose
    multiplicity reaches zero drops out (exactly when the from-scratch
    distinct set loses it). Same signed-contribution algebra and
    null-safe merge as ``delta_apply_rollup``; multiplicities are
    integers, so incremental ≡ recompute is exact with no DECIMAL
    machinery needed.

    Scale: |changes| aggregation + a full-outer merge on the support
    relation — the snapshot is never re-read. The merge touches
    |support| rows; at 100 TB partition both sides by the group keys
    so it is co-located (same note as the rollup merge).
    """
    from functools import reduce

    keys = list(group_keys)
    top = set(cdc.columns) - {"change_type", "old", "new"}

    def side(sign: int, struct_col: str) -> DataFrame:
        def resolve(name: str):
            return F.col(name) if name in top else F.col(f"{struct_col}.{name}")

        return cdc.filter(F.col(struct_col).isNotNull()).select(
            *[resolve(k).alias(k) for k in keys],
            resolve(key_col).alias(key_col),
            F.lit(sign).alias("_sign"),
        )

    contrib = side(-1, "old").unionByName(side(1, "new"))
    delta = contrib.groupBy(*keys, key_col).agg(F.sum("_sign").alias("_dmult"))
    if prev_support is None:
        return delta.select(
            *keys, key_col, F.col("_dmult").alias("mult")
        ).filter(F.col("mult") > 0)
    allk = keys + [key_col]
    cond = reduce(
        lambda a, b: a & b, [prev_support[k].eqNullSafe(delta[k]) for k in allk]
    )
    merged = prev_support.join(delta, cond, "full_outer").select(
        *[F.coalesce(prev_support[k], delta[k]).alias(k) for k in allk],
        (
            F.coalesce(F.col("mult"), F.lit(0)) + F.coalesce(F.col("_dmult"), F.lit(0))
        ).alias("mult"),
    )
    return merged.filter(F.col("mult") > 0)


def distinct_count_report(
    support: DataFrame,
    group_keys: Sequence[str],
    resketch_threshold: int | None = None,
) -> DataFrame:
    """(keys…, n_distinct[, resketch]) from a support relation — one
    count per group, no re-scan of anything. A NULL distinct key is one
    support row and counts as one distinct value (groupBy semantics;
    note SQL COUNT(DISTINCT) would ignore it — align inputs if parity
    with a SQL twin matters).

    ``resketch_threshold`` emits the hybrid-policy flag VERDICT r6
    task 7 asks for: groups whose support grew past the threshold are
    marked for demotion to a mergeable sketch (queries/stats.py HLL)
    with a re-sketch cadence, trading exact deletes for O(registers)
    state — the same monitor-then-act shape as the IVF drift report's
    ``recluster`` flag. The flag is advisory (a report), because the
    right cap is a per-deployment storage decision, not an engine
    constant.
    """
    keys = list(group_keys)
    agg = support.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_distinct"))
    if resketch_threshold is not None:
        agg = agg.withColumn(
            "resketch", F.col("n_distinct") > F.lit(int(resketch_threshold))
        )
    return agg
