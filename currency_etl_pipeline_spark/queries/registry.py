"""Registry of named queries + DuckDB oracle SQL twins.

Oracle-parity conventions (FIXTURES.md):
1. literal anchor timestamps, never now();
2. every ORDER BY..LIMIT / row_number has a unique tie-breaker;
3. multi-row double sums go through exact DECIMAL (see functions.scalars.dec)
   so both engines produce the identical double — per-row double math is
   already IEEE-deterministic;
4. timestamps rendered as UTC microsecond strings (ts_str / strftime).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

# Shared literal anchor for time-window queries (events span Jan 2024).
ANCHOR = "2024-01-30 00:00:00"
ANCHOR_MINUS_24H = "2024-01-29 00:00:00"


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}
