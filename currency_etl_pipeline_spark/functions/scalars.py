"""Scalar column functions — the reference's §2.C surface, Spark-native.

All JVM-side built-ins (whole-stage codegen); no Python UDFs here.

Oracle-parity helpers (FIXTURES.md rules):
- ``dec``    — route double arithmetic through exact DECIMAL so Spark
  and any ANSI engine (DuckDB oracle) agree bit-for-bit on sums.
- ``ts_str`` — canonical microsecond string form for timestamps in
  checked outputs (engines disagree on tz-naive vs instant rendering).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCKDB = "%Y-%m-%d %H:%M:%S.%f"


def dec(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    """Cast to DECIMAL for exact (associativity-independent) aggregation.

    Summing doubles is partition-order-dependent; at 100 TB the plan's
    partial-aggregate tree differs run to run. DECIMAL accumulation is
    exact, so results are stable across partitionings AND across
    engines — cast back to double (+ round) only at the output edge.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def ts_str(col: Column | str) -> Column:
    """Canonical string form of a timestamp (UTC session, microseconds)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, TS_FMT_SPARK)


def pair_split_substring(pair: Column | str, base_len: Column | int) -> Column:
    """Target code as length-offset suffix of the pair ("GBPUSD"→"USD").

    Reference: fetch.py:44 (``pair[len(base):]``).
    """
    p = F.col(pair) if isinstance(pair, str) else pair
    off = F.lit(base_len) if isinstance(base_len, int) else base_len
    return p.substr(off + 1, F.length(p))


def pair_split_regex(pair: Column | str, group: int) -> Column:
    """Base (group 1) / target (group 2) via one regex pass.

    Reference: load_to_bigquery.py:41-42
    (``pair.str.extract(r"([A-Z]{3})([A-Z]{3})")``).
    """
    p = F.col(pair) if isinstance(pair, str) else pair
    return F.regexp_extract(p, r"([A-Z]{3})([A-Z]{3})", group)


def coerce_double(col: Column | str) -> Column:
    """Numeric coercion, NULL on malformed — pandas ``to_numeric(errors="coerce")``.

    Reference: transform.py:40, load_to_bigquery.py:44. ``try_cast``
    keeps the semantic under ANSI mode too.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def parse_timestamp(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Timestamp parse, NULL on failure — pandas ``to_datetime(errors="coerce")``.

    Reference: load_to_bigquery.py:50.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c, fmt)


def pct_change_expr(latest: Column, prev: Column) -> Column:
    """(latest - prev) / prev * 100 with the reference's zero-division guard.

    Reference: fetch_transform_load_dag.py:144-148 (returns NULL where
    prev == 0 instead of raising).
    """
    return F.when(prev != 0, (latest - prev) / prev * 100.0)


def direction_expr(diff: Column) -> Column:
    """Three-way CASE: increase / decrease / no_change from sign of diff.

    Reference: fetch_transform_load_dag.py:147.
    """
    return (
        F.when(diff > 0, F.lit("increase"))
        .when(diff < 0, F.lit("decrease"))
        .otherwise(F.lit("no_change"))
    )
