"""Adaptive catalog ordering for the driver's bounded correctness sweep.

The per-round sweep adjudicates a bounded prefix of ``queries()`` (round 1:
exactly the first 50 of 59, in registration order). ``ordered_names()``
therefore front-loads queries that have never received a driver row, then
least-recently-checked ones, so coverage rotates across rounds and every
query cumulatively gets the hard signal.
"""

import json

from currency_etl_pipeline_spark.queries import all_queries, all_oracles
from currency_etl_pipeline_spark.queries.registry import (
    _REGISTRY,
    _driver_coverage,
    ordered_names,
)


def test_never_checked_come_first(tmp_path):
    names = list(_REGISTRY)
    assert len(names) >= 10
    # Pretend the driver checked everything except three queries, in round 1,
    # and two others more recently in round 2.
    unchecked = {names[3], names[7], names[9]}
    recent = {names[0], names[5]}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {} for n in names if n not in unchecked})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({n: {} for n in recent})
    )

    order = ordered_names(root=tmp_path)
    assert set(order) == set(names)
    # Tier 0: never checked, in registration order.
    assert order[:3] == [n for n in names if n in unchecked]
    # Tier 2 (checked again in r02) sorts after tier 1 (last checked in r01).
    tail = order[-2:]
    assert tail == [n for n in names if n in recent]


def test_ordering_is_deterministic_and_complete(tmp_path):
    # No correctness files at all -> pure registration order.
    assert ordered_names(root=tmp_path) == list(_REGISTRY)
    # Corrupt file is ignored, not fatal.
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    assert ordered_names(root=tmp_path) == list(_REGISTRY)


def test_failed_queries_sort_into_tier_zero(tmp_path):
    names = list(_REGISTRY)
    failed_flag = names[4]  # newest row has an explicit False match flag
    failed_err = names[6]  # newest row has an exception err
    rows_only_ok = names[8]  # no_oracle but rows recorded -> counts as pass
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {"rows_match": True, "err": None} for n in names})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                failed_flag: {"rows_match": True, "hash_match": False, "err": None},
                failed_err: {"rows_match": None, "err": "AnalysisException: boom"},
                rows_only_ok: {"rows_match": None, "spark_rows": 5, "err": "no_oracle"},
            }
        )
    )
    order = ordered_names(root=tmp_path)
    # Failures lead the sweep despite being the most recently checked...
    assert order[:2] == [failed_flag, failed_err]
    # ...while the healthy rows-only query sorts to the newest-checked tail.
    assert order[-1] == rows_only_ok


def test_all_queries_is_stable_registration_order():
    # Library API is environment-independent: plain registration order,
    # regardless of what CORRECTNESS_r*.json files sit at the repo root.
    q = list(all_queries())
    o = list(all_oracles())
    assert q == list(_REGISTRY)
    assert o == [n for n in q if _REGISTRY[n].oracle is not None]
    # The adaptive rotation is a permutation of the same catalog.
    assert sorted(ordered_names()) == sorted(q)


def test_driver_entry_uses_rotation_order():
    import __spark_entry__ as entry

    assert list(entry.queries()) == ordered_names()


def test_edited_queries_reenter_tier_zero(tmp_path):
    """A query whose source changed since its last green driver row must
    re-enter the sweep prefix (a pass recorded for code that no longer
    exists is not evidence). CHECKED_HASHES.json records the hash as of
    the last check; a mismatch with the current source re-tiers to 0."""
    from currency_etl_pipeline_spark.queries.registry import (
        _source_hash,
        refresh_checked_hashes,
    )

    names = list(_REGISTRY)
    edited = names[5]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {"rows_match": True, "err": None} for n in names})
    )
    hashes = {n: _source_hash(_REGISTRY[n]) for n in names}
    hashes[edited] = "0" * 32  # pretend the recorded hash predates an edit
    (tmp_path / "CHECKED_HASHES.json").write_text(json.dumps(hashes))
    order = ordered_names(root=tmp_path)
    assert order[0] == edited, "edited query did not re-enter the sweep prefix"
    # refresh_checked_hashes records the current source for green queries,
    # after which the edited query rotates back out of tier 0.
    refresh_checked_hashes(root=tmp_path)
    order2 = ordered_names(root=tmp_path)
    assert order2 == [n for n in names]  # all same round, registration order


def test_malformed_rows_reenter_tier_zero(tmp_path):
    """A truncated/corrupt CORRECTNESS row (non-dict) carries no pass
    signal — it must sort into tier 0 for re-checking, not rotate to
    the tail as if it had recently passed."""
    names = list(_REGISTRY)
    corrupt = names[2]
    rows = {n: {"rows_match": True, "err": None} for n in names}
    rows[corrupt] = "truncated garbage"
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    order = ordered_names(root=tmp_path)
    assert order[0] == corrupt


def test_readme_catalog_count_matches_registry():
    """README's catalog line must state the ACTUAL counts — it drifted
    in r5 (135) and again in r6 (136 vs actual 137), so pin it: the
    'N named queries (M with DuckDB oracle' numbers are parsed from
    README.md and compared to the registry (VERDICT r6 task 6)."""
    import re
    from pathlib import Path

    from currency_etl_pipeline_spark.queries.registry import all_oracles, all_queries

    readme = (Path(__file__).resolve().parents[1] / "README.md").read_text()
    m = re.search(r"(\d+) named queries \((\d+) with DuckDB oracle", readme)
    assert m, "README catalog line not found"
    assert int(m.group(1)) == len(all_queries()), "README query count drifted"
    assert int(m.group(2)) == len(all_oracles()), "README oracle count drifted"


def test_bench_headline_covers_entire_registry():
    """r8: the bench list is definitionally 'every registered query' —
    VERDICT r7 found 54 of 140 queries with no timing history at all,
    an accident this pin makes impossible (a new query must be added
    to bench.py::HEADLINE or this fails). Order is NOT pinned: HEADLINE
    is append-only so cross-round per-query ratios stay comparable, and
    set equality leaves that discipline to review."""
    import bench

    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate bench entries"
    assert set(bench.HEADLINE) == set(_REGISTRY), (
        "bench/registry drift: "
        f"unbenched={sorted(set(_REGISTRY) - set(bench.HEADLINE))} "
        f"unknown={sorted(set(bench.HEADLINE) - set(_REGISTRY))}"
    )


def test_readme_oldest_adjudication_matches_registry():
    """r8 (VERDICT r7 task 8): README's catalog line also states the
    rotation's health metric — the oldest 'newest CORRECTNESS round'
    across the registry. Parsed and compared so it cannot drift the
    way the counts did in r5/r6.

    r9 (VERDICT r8 task 4): the line now names the round it describes
    ("entering rN: rM") and the comparison computes the metric over
    CORRECTNESS files ≤ N-1 only. The previous form ("entering this
    round") raced the driver: its sweep lands a new CORRECTNESS file
    AFTER the builder's final commit, so a line that was true when
    committed was guaranteed stale at judging time whenever the sweep
    advanced the minimum."""
    import re
    from pathlib import Path

    from currency_etl_pipeline_spark.queries.registry import oldest_adjudicated_round

    readme = (Path(__file__).resolve().parents[1] / "README.md").read_text()
    m = re.search(r"oldest driver\s+adjudication entering r(\d+): r(\d+)", readme)
    assert m, "README oldest-adjudication line not found"
    entering, stated = int(m.group(1)), int(m.group(2))
    assert stated == oldest_adjudicated_round(max_round=entering - 1), (
        "README oldest-adjudication round drifted from CORRECTNESS_r* state"
    )
