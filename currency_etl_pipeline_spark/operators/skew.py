"""Skew-mitigation operators: salted two-phase aggregation and a
salted replicate-broadcast join.

The reference never hits skew (single-machine pandas over ~170 rows,
fetch.py:22-40), but the 100 TB design target does: a currency-rate
event log is Zipf-distributed over pair keys (USD pairs dominate), and
a plain ``groupBy(pair)`` or ``join(dim)`` puts the whole hot key in
one reducer. Two standard remedies, both pure DataFrame ops:

- ``salted_aggregate`` — phase 1 groups by (key, salt) so a hot key's
  rows spread over ``salt_n`` reducers; phase 2 re-aggregates the
  ``salt_n`` partials per key. Requires an algebraic (re-aggregable)
  aggregate: count→sum, sum→sum, min→min, max→max.
- ``salted_join`` — big side gets a deterministic salt from a unique
  column; small side is replicated ``salt_n``× with an exploded salt
  id, so each hot-key partition joins locally. (When the small side
  fits in memory, prefer ``F.broadcast`` — no shuffle at all; salting
  is for the mid-size dim that can't broadcast.)

Both produce results identical to the unsalted plan, so their oracle
twins are the plain GROUP BY / JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_col: Column,
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: name -> aggregate over raw rows (phase 1, keyed
    by keys+salt). ``final_aggs``: name -> aggregate over the phase-1
    partial columns (phase 2, keyed by keys alone). ``salt_col`` must
    be deterministic (e.g. ``pmod(xxhash64(unique_id), n)``) so reruns
    and retried tasks agree.
    """
    salted = df.withColumn(_SALT, F.pmod(salt_col, F.lit(salt_n)))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(*[c.alias(name) for name, c in final_aggs.items()])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    big_salt_col: Column,
    salt_n: int = 16,
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated ``salt_n``×, so one hot key spreads over ``salt_n``
    shuffle partitions instead of one.

    ``big_salt_col`` may be nullable: a NULL salt would never equi-match
    the exploded 0..salt_n-1 ids and would silently drop the row, so it
    is coalesced to bucket 0 (rows whose JOIN KEYS are null are dropped
    by the inner join either way, same as the unsalted plan).
    """
    big_s = big.withColumn(
        _SALT, F.pmod(F.coalesce(big_salt_col, F.lit(0)), F.lit(salt_n)).cast("int")
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return big_s.join(small_s, keys + [_SALT], "inner").drop(_SALT)


def skew_profile(df: DataFrame, keys: list[str], k: int = 20) -> DataFrame:
    """Hot-key profile for a prospective join/agg key: top-``k`` keys by
    row count with each key's share and the cumulative share — the
    numbers that decide whether a key needs salting (one key at >20%
    of rows means one reducer owns a fifth of the shuffle) and what
    ``salt_n`` to pick (≈ hot-key share × shuffle partitions).

    Scale: one hash-agg on the key (map-side partial), a distributed
    top-k (TakeOrderedAndProject — never a global sort), and a window
    over the ``k`` surviving rows. Shares divide exact BIGINTs at the
    output edge, so the profile is partition-count independent.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").cast("bigint").alias("total_rows"))
    order = [F.col("n_rows").desc(), *[F.col(c).asc() for c in keys]]
    top = counts.orderBy(*order).limit(k)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    # The unpartitioned window runs over exactly k rows (post-limit) —
    # bounded by construction, never corpus-sized.
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            F.row_number().over(Window.orderBy(*order)).alias("rank"),
            F.round(F.col("n_rows") * 1.0 / F.col("total_rows"), 6).alias("share"),
            F.round(
                F.sum("n_rows").over(w) * 1.0 / F.col("total_rows"), 6
            ).alias("cum_share"),
        )
    )
