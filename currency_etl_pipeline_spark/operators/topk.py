"""Sorts / limits / top-k — the reference's dominant query shape (§2.E).

Reference sites: ORDER BY timestamp DESC LIMIT 1 (point latest,
app.py:154-160), LIMIT 5000 (dashboard working set, app.py:44-48),
ASC LIMIT 1 in a trailing window (fetch_transform_load_dag.py:128-136).

Scale notes: ``orderBy().limit(n)`` compiles to TakeOrderedAndProject —
each partition keeps a size-n heap, then the driver merges n·p rows;
no global sort, no full shuffle. Per-group top-k is one hash shuffle
on the group key with ranking inside partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__topk_rn"


def _order_cols(order_by: Sequence[str | Column], descending: bool) -> list[Column]:
    out: list[Column] = []
    for c in order_by:
        if isinstance(c, str):
            col = F.col(c)
            out.append(col.desc() if descending else col.asc())
        else:
            # Pre-built Column: assume direction already applied.
            out.append(c)
    return out


def top_n(df: DataFrame, order_by: Sequence[str | Column], n: int, descending: bool = True) -> DataFrame:
    """Global top-n (TakeOrderedAndProject). Always pass a total order —
    include a unique tie-breaker column (FIXTURES.md rule 2)."""
    return df.orderBy(*_order_cols(order_by, descending)).limit(n)


def top_k_per_group(
    df: DataFrame,
    group_keys: Sequence[str],
    order_by: Sequence[str | Column],
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Top-k rows per group via row_number — the per-key generalization
    of the reference's point-latest lookup."""
    w = Window.partitionBy(*group_keys).orderBy(*_order_cols(order_by, descending))
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= k)
        .drop(_RN)
    )
