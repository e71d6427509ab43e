"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the orders⋈lineitem shuffle dominates any join-heavy
workload. Writing both tables bucketed (and sorted) by the join key
lets Spark's SortMergeJoin read bucket i of each side directly —
no Exchange in the plan at all; the shuffle was paid once at write
time and is amortized over every subsequent join.

This is the Spark-native replacement for the reference's habit of
re-materializing CSV between stages (SURVEY.md §3 EP1): materialize
ONCE, in the layout your queries want.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+ sorted) managed table.

    `num_buckets` should divide evenly into cluster cores at the
    deployment scale (buckets are the parallelism floor for bucket
    scans); 8 suits local tests, hundreds suit a real cluster.
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket counts and keys the physical plan contains no
    Exchange on either side (assert_no_shuffle in tests pins this).
    """
    return spark.table(left_table).join(spark.table(right_table), list(on))
