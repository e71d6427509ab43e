"""Declarative data-quality checks — the expectations gate a warehouse
runs before publishing a table (the reference's only validation was
ad-hoc runtime raises, fetch.py:33-56 / transform.py:18-19; this is
that idea as a first-class, composable operator).

Three check classes, each returning a (check, n_violations) row:

- row checks: a boolean Column that must hold for every row — ONE
  shared aggregation pass evaluates all of them together (conditional
  sums), so adding a check never adds a scan;
- uniqueness: count(*) - count(distinct keys) over one aggregate;
- referential integrity: a LEFT ANTI join counting child keys with no
  parent — the join-shaped check that cannot ride the row pass.

The report is a small unioned DataFrame (one row per check) — lazily
composed, so callers can `.filter(n_violations > 0)` and fail the
publish step, or land the report next to the data. At 100 TB the row
pass is one scan with counter-only shuffle; uniqueness shuffles the
key columns; each FK check shuffles child keys against the parent dim
(broadcast when small — AQE's call).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("check", "n_violations")


def row_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """(check, n_violations) for named per-row conditions that must be
    TRUE; NULL condition results count as violations (an expectation
    that cannot be evaluated is not satisfied). An EMPTY table reports
    0 violations per check (sum over no rows is NULL — coalesced, so a
    gate's `n_violations == 0` holds for an empty-but-valid load).
    Check names are carried as literals, never interpolated into SQL,
    so any string is a valid name."""
    if not checks:
        raise ValueError("no checks given")
    aggs = [
        F.coalesce(
            F.sum(F.when(cond.eqNullSafe(F.lit(True)), 0).otherwise(1)), F.lit(0)
        ).alias(f"__chk{i}")
        for i, cond in enumerate(checks.values())
    ]
    wide = df.agg(*aggs)
    kv = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"__chk{i}").alias("n_violations"),
            )
            for i, name in enumerate(checks)
        ]
    )
    return wide.select(F.explode(kv).alias("kv")).select("kv.check", "kv.n_violations")


def unique_check(df: DataFrame, keys: Sequence[str], name: str | None = None) -> DataFrame:
    """(check, n_violations) where violations = rows beyond the first
    per key (0 when the keys are unique)."""
    keys = list(keys)
    name = name or f"unique({', '.join(keys)})"
    return df.agg(
        (F.count(F.lit(1)) - F.countDistinct(*keys)).alias("n_violations")
    ).select(F.lit(name).alias("check"), "n_violations")


def fk_check(
    child: DataFrame,
    keys: Sequence[str],
    parent: DataFrame,
    parent_keys: Sequence[str],
    name: str | None = None,
) -> DataFrame:
    """(check, n_violations) where violations = child rows whose key
    has no parent row (NULL child keys count as violations — an
    unresolvable reference is a broken reference)."""
    keys, parent_keys = list(keys), list(parent_keys)
    if len(keys) != len(parent_keys):
        raise ValueError(
            f"child keys {keys} and parent keys {parent_keys} differ in length — "
            "a truncated zip would under-count orphans silently"
        )
    name = name or f"fk({', '.join(keys)})"
    p = parent.select(
        *[F.col(pk).alias(k) for k, pk in zip(keys, parent_keys)]
    ).distinct()
    orphans = child.select(*keys).join(p, keys, "left_anti")
    return orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(name).alias("check"), "n_violations"
    )


def quality_report(parts: Sequence[DataFrame]) -> DataFrame:
    """Union the check outputs into one (check, n_violations) report."""
    parts = list(parts)
    if not parts:
        raise ValueError("no report parts")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
