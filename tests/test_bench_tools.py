"""Pins for the bench grading instruments (r15): analyze_bench is now
the per-round perf verdict (VERDICT r14 task 4 — the round summary
must be reproducible by running the tool), so its arithmetic is
load-bearing and gets the same regression treatment as a query."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from tools.analyze_bench import (
    _bracket_probes,
    calibrated,
    load_record,
    nearest_probe,
    spike_rows,
)


def _record(queries: dict[str, float], series=None, calibration=0.5) -> dict:
    rec = {"value": sum(queries.values()), "queries": queries, "calibration": calibration}
    if series is not None:
        rec["calibration_series"] = series
    return rec


def test_nearest_probe_picks_closest_after_position():
    name = HEADLINE[14]  # position 15: probes at 10 and 20 tie-break to 10
    series = [
        {"after": 0, "sec": 1.0},
        {"after": 10, "sec": 2.0},
        {"after": 20, "sec": 3.0},
    ]
    rec = _record({name: 4.0}, series=series)
    assert nearest_probe(rec)[name] == 2.0  # tie → earlier probe
    assert calibrated(rec)[name] == 2.0


def test_nearest_probe_falls_back_to_scalar_without_series():
    name = HEADLINE[0]
    rec = _record({name: 4.0}, calibration=0.8)
    assert nearest_probe(rec)[name] == 0.8


def test_bracket_probes_straddle_position():
    series = [{"after": 0, "sec": 1.0}, {"after": 10, "sec": 2.0}, {"after": 20, "sec": 3.0}]
    before, after = _bracket_probes({"calibration_series": series}, 15)
    assert (before["after"], after["after"]) == (10, 20)
    before, after = _bracket_probes({"calibration_series": series}, 10)
    assert (before["after"], after["after"]) == (10, 10)
    assert _bracket_probes({}, 15) == (None, None)


def _spike_fixture(new_probe_sec: float):
    """OLD: flat probes, query at 1s. NEW: query at 6s, probes at
    ``new_probe_sec``. Position 5 sits between probes at 0 and 10."""
    name = HEADLINE[4]
    series_old = [{"after": 0, "sec": 0.5}, {"after": 10, "sec": 0.5}]
    series_new = [{"after": 0, "sec": new_probe_sec}, {"after": 10, "sec": new_probe_sec}]
    old = _record({name: 1.0}, series=series_old)
    new = _record({name: 6.0}, series=series_new)
    ratios = {name: calibrated(new)[name] / calibrated(old)[name]}
    return name, old, new, ratios


def test_spike_with_flat_probes_is_unresolved():
    name, old, new, ratios = _spike_fixture(new_probe_sec=0.5)
    rows = spike_rows(old, new, ratios)
    assert len(rows) == 1
    assert rows[0]["name"] == name
    assert rows[0]["flag"] == "unresolved"
    assert rows[0]["bracket_probe_ratios"] == [1.0, 1.0]


def test_spike_with_elevated_probe_is_host_adjudicated():
    _, old, new, ratios = _spike_fixture(new_probe_sec=0.8)  # probes 1.6x
    # calibrated ratio: (6/0.8) / (1/0.5) = 3.75 — still a spike row
    rows = spike_rows(old, new, ratios)
    assert len(rows) == 1 and rows[0]["flag"] == "host_elevated"


def test_spike_without_series_flags_no_series():
    name = HEADLINE[4]
    old = _record({name: 1.0})  # pre-r14 record: scalar only
    new = _record({name: 6.0})
    ratios = {name: 6.0}
    rows = spike_rows(old, new, ratios)
    assert rows[0]["flag"] == "no_series"


def test_sub_threshold_rows_are_not_spikes():
    name, old, new, ratios = _spike_fixture(new_probe_sec=0.5)
    ratios[name] = 1.9
    assert spike_rows(old, new, ratios) == []


def test_spike_rows_carry_stream_epochs_when_present():
    name, old, new, ratios = _spike_fixture(new_probe_sec=0.5)
    new["stream_epochs"] = {name: [4200, 900, 950]}
    rows = spike_rows(old, new, ratios)
    assert rows[0]["new_epochs_ms"] == [4200, 900, 950]
    assert "old_epochs_ms" not in rows[0]


def test_load_record_unwraps_driver_envelope(tmp_path):
    raw = _record({HEADLINE[0]: 1.0})
    p1 = tmp_path / "raw.json"
    p1.write_text(json.dumps(raw))
    assert load_record(str(p1))["queries"] == raw["queries"]

    p2 = tmp_path / "wrapped.json"
    p2.write_text(json.dumps({"n": 1, "rc": 0, "parsed": raw}))
    assert load_record(str(p2))["queries"] == raw["queries"]

    p3 = tmp_path / "truncated.json"
    p3.write_text(json.dumps({"n": 1, "rc": 0, "parsed": None, "tail": "..."}))
    try:
        load_record(str(p3))
        raise AssertionError("truncated driver record must be rejected loudly")
    except SystemExit:
        pass


def test_stdout_contract_is_slim():
    """r16 (VERDICT r15 task 5): the stdout one-line JSON must carry the
    contract fields ONLY — the ~20 KB calibration_series/stream_epochs
    payload once outran the driver's tail capture and lost an entire
    round-over-round PERF comparison (BENCH_r14 parsed=null). The full
    record still lands in bench_results/rNN.json via _persist."""
    from bench import stdout_contract

    def full_record(queries):
        return {
            "metric": "headline_queries_total_wall",
            "value": sum(queries.values()),
            "unit": "sec",
            "queries": queries,
            "calibration": 0.5,
            "calibration_series": [{"after": i, "sec": 0.5} for i in range(40)],
            "stream_epochs": {"streaming_x": [1000] * 50},
            "sf": 0.1,
        }

    line = stdout_contract(full_record({HEADLINE[0]: 1.0}))
    assert set(line) == {"metric", "value", "unit", "queries", "calibration", "sf"}
    # the full catalog at ~193 queries serializes to a few KB, not tens
    big = {f"query_name_{i:03d}": 1.234 for i in range(200)}
    assert len(json.dumps(stdout_contract(full_record(big)))) < 8000
