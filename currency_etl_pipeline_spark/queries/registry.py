"""Registry of named queries + DuckDB oracle SQL twins.

Oracle-parity conventions (FIXTURES.md):
1. literal anchor timestamps, never now();
2. every ORDER BY..LIMIT / row_number has a unique tie-breaker;
3. multi-row double sums go through exact DECIMAL (see functions.scalars.dec)
   so both engines produce the identical double — per-row double math is
   already IEEE-deterministic;
4. timestamps rendered as UTC microsecond strings (ts_str / strftime);
5. integer sums in oracles are CAST(... AS BIGINT) — DuckDB widens
   sum(BIGINT/INT) to HUGEINT, which serializes differently from Spark's
   BIGINT and breaks the driver's value hash on type, not value.
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


def _row_passed(row) -> bool:
    """Did a CORRECTNESS row record a clean pass?

    A rows-only check (err == "no_oracle" with a recorded spark row count)
    counts as a pass — it is the strongest signal a non-SQL-expressible
    query can get, by design. Anything with an explicit False match flag
    or any other err (an exception string) is a failure and must be
    re-adjudicated first next round.
    """
    if not isinstance(row, dict):
        return False  # malformed/truncated rows must re-enter the checked prefix
    err = row.get("err")
    if err is not None and err != "no_oracle":
        return False
    if err == "no_oracle" and row.get("spark_rows") is None:
        return False
    return not any(row.get(k) is False for k in ("rows_match", "schema_match", "hash_match"))


def _source_hash(spec: QuerySpec) -> str:
    """md5 of the query function's current source + oracle SQL.

    Limitation (accepted): helpers a query calls (operators.asof, …)
    are not part of the hash; editing only a shared helper will not
    re-tier its callers. Editing the query function or its oracle —
    the overwhelmingly common case — will.
    """
    import hashlib
    import inspect

    try:
        src = inspect.getsource(spec.spark)
    except (OSError, TypeError):
        src = spec.name  # source unavailable → stable fallback
    return hashlib.md5((src + (spec.oracle or "")).encode()).hexdigest()


def _checked_hashes_path(root=None):
    from pathlib import Path

    root = Path(root) if root is not None else Path(__file__).resolve().parents[2]
    return root / "CHECKED_HASHES.json"


def _checked_hashes(root=None) -> dict[str, str]:
    """name -> md5 of the query source AS OF its newest driver check.

    Refreshed at the start of each round by ``refresh_checked_hashes``
    (from the previous round's final commit — the code the driver's
    sweep actually adjudicated). A query whose CURRENT source hash
    differs was edited since its last green row and must re-enter the
    sweep prefix — a green row for code that no longer exists is not
    evidence.
    """
    import json

    try:
        data = json.loads(_checked_hashes_path(root).read_text())
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def refresh_checked_hashes(root=None) -> int:
    """Record the current source hash for every query whose newest
    CORRECTNESS row is a pass. Run at the START of a round, before any
    editing, so the recorded hashes describe the code the previous
    sweep validated. Returns the number of entries written.
    """
    import json

    coverage = _driver_coverage(root)
    out = dict(_checked_hashes(root))
    for name, spec in _REGISTRY.items():
        rnd, ok = coverage.get(name, (0, False))
        if rnd > 0 and ok:
            out[name] = _source_hash(spec)
    _checked_hashes_path(root).write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    return len(out)


def _driver_coverage(root=None, max_round: int | None = None) -> dict[str, tuple[int, bool]]:
    """Map query name -> (newest round with a CORRECTNESS row, passed?).

    The per-round correctness sweep adjudicates a bounded prefix of
    ``queries()`` (round 1 recorded exactly the first 50 of 59 registered
    queries, in registration order, and stopped). Queries past the cutoff
    never receive the driver's hard correctness signal, no matter how many
    rounds run, unless the ordering changes. ``passed`` reflects only the
    newest round's row for the query.

    ``max_round`` (inclusive) restricts the scan to CORRECTNESS files from
    that round or earlier — the device that lets a committed statement
    "as of entering round N" stay verifiable after the round-N sweep
    lands a newer file the commit could not have seen (VERDICT r8 task 4).
    """
    import json
    import re
    from pathlib import Path

    root = Path(root) if root is not None else Path(__file__).resolve().parents[2]
    seen: dict[str, tuple[int, bool]] = {}
    for p in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        if m is None:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if name not in seen or rnd > seen[name][0]:
                seen[name] = (rnd, _row_passed(row))
    return seen


def ordered_names(root=None) -> list[str]:
    """Registry names: failed-or-never-checked first, then least-recently-checked.

    Tier 0 is any query with NO driver pass signal — never adjudicated,
    whose newest CORRECTNESS row records a failure (False match flag or an
    error), or whose SOURCE CHANGED since its last green row (the recorded
    hash in CHECKED_HASHES.json no longer matches — a pass for code that
    no longer exists is not evidence). Failures and edits therefore always
    re-enter the driver's bounded sweep prefix instead of aging out into
    the long tail. Within every tier the order is registration order, so
    the whole sequence is deterministic. This rotates the bounded sweep
    across rounds: new, skipped, failing, and freshly-edited queries lead;
    long-green queries cycle back for periodic re-validation.
    """
    coverage = _driver_coverage(root)
    hashes = _checked_hashes(root)
    names = list(_REGISTRY)

    def key(n: str):
        rnd, ok = coverage.get(n, (0, True))
        if ok and rnd > 0 and n in hashes and hashes[n] != _source_hash(_REGISTRY[n]):
            rnd = 0  # edited since its last green check
        return (rnd if ok else 0, names.index(n))

    return sorted(names, key=key)


def oldest_adjudicated_round(root=None, max_round: int | None = None) -> int:
    """The oldest 'newest CORRECTNESS round' among queries the driver
    has adjudicated at least once — the rotation's health metric: with
    a ~50-row sweep over 140 queries, a full re-green takes 3 rounds,
    so this should trail the current round by at most ~3. Queries
    never yet checked are excluded (they sit in tier 0 of the sweep
    order and are picked up next round by construction). Surfaced in
    README's catalog line and pinned by tests/test_registry_order.py
    (VERDICT r7 task 8).

    ``max_round``: compute the metric as of ENTERING round max_round+1,
    i.e. over CORRECTNESS files ≤ max_round only. README states the
    metric "entering rN"; the pin test passes max_round=N-1 so the
    driver's round-N sweep (which lands after the builder's last
    commit) cannot retroactively falsify the committed line (the r8
    race: README said r5, true at commit time, the sweep moved it to
    r6 five hours later — VERDICT r8 What's-wrong #3)."""
    coverage = _driver_coverage(root, max_round=max_round)
    rounds = [coverage[n][0] for n in _REGISTRY if n in coverage]
    return min(rounds, default=0)


def all_queries() -> dict[str, QuerySpec]:
    """Catalog in stable registration order (environment-independent).

    The adaptive, CORRECTNESS-file-driven rotation is exposed only via
    ``ordered_names()`` and the driver entry point (``__spark_entry__``),
    so library consumers (bench, plan tests) see the same order on every
    checkout.
    """
    return dict(_REGISTRY)


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}
