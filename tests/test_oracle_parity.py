"""Every oracle-checked catalog query must match DuckDB exactly —
the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from currency_etl_pipeline_spark.queries import all_queries
from tests.oracle_harness import compare, duck_connection

SPECS = all_queries()
CHECKED = sorted(n for n, s in SPECS.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = SPECS[name]
    df = spec.spark(spark, sf_dir)
    compare(df, duck, spec.oracle)


def test_all_queries_have_docstrings():
    for name, spec in SPECS.items():
        assert spec.doc.strip(), f"{name} lacks a docstring"


def test_dedup_consensus_gate_bites(spark, sf_dir):
    """The consensus cosine gate must actually adjudicate — at least
    one LSH candidate pair survives it AND at least one is rejected.
    Guards against the round-2 vacuous state (threshold filtered every
    candidate, so the oracle match was 0 == 0). Pins one known-kept and
    one known-rejected pair at sf0.001."""
    rows = SPECS["dedup_consensus"].spark(spark, sf_dir).collect()
    kept = {(r["id_a"], r["id_b"]) for r in rows}
    assert kept, "consensus gate rejected every candidate — vacuous again"
    assert all(r["cos_sim"] >= 0.0 for r in rows)
    if sf_dir.endswith("sf0.001"):
        assert (12, 120) in kept, "known agreeing pair (cos ~0.33) was dropped"
        assert (8, 360) not in kept, "known disagreeing pair (cos ~-0.30) survived"
