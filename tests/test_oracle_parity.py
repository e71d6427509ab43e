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


def test_scalar_pandas_udf_null_text_yields_null(spark, tmp_path):
    """NULL text must map to NULL counts (SQL semantics, matching the
    oracle and the UDTF twin) — pandas .str.len() yields NaN for None
    and a plain .astype('int64') RAISES on it; the nullable Int64 path
    must survive a corpus with null documents (fixture has none)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b  c", None, " x "], pa.string()),
            "lang": pa.array(["en", "en", "en"], pa.string()),
            "source": pa.array(["s", "s", "s"], pa.string()),
            "n_chars": pa.array([6, 0, 3], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: (r["n_tokens"], r["n_trim_chars"])
        for r in SPECS["scalar_pandas_udf_tokens"].spark(spark, str(tmp_path)).collect()
    }
    assert rows[0] == (3, 6)
    assert rows[1] == (None, None), "null text must produce NULL, not crash"
    assert rows[2] == (1, 1)


def test_zscore_degenerate_groups_match_oracle(spark, tmp_path):
    """Singleton and zero-variance event types must NOT diverge between
    engines (n-1 = 0: Spark x/0 → NULL, DuckDB double x/0 → inf;
    zero variance: NULL vs NaN). Both now define z as NULL there and
    filter it — so only the healthy group's rows survive, identically.
    Fixture data never exercises this (every type has many rows)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (0, 1, "single", 5.0),
        (1, 1, "const", 2.0),
        (2, 2, "const", 2.0),
        (3, 3, "const", 2.0),
        (4, 1, "spread", 1.0),
        (5, 2, "spread", 2.0),
        (6, 3, "spread", 3.0),
        (7, 4, "spread", 10.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "ts": pa.array([1_700_000_000_000_000 + r[0] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    spec = SPECS["events_anomaly_zscore"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    compare(df, con, spec.oracle)
    got = {r["event_type"] for r in df.collect()}
    assert got == {"spread"}, "degenerate groups must drop out, healthy group must stay"


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
