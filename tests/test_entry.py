from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"user_id", "event_type", "rate", "ts_utc"}


def test_contract_shapes(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs), "every oracle key must be a query"
    for name, fn in qs.items():
        assert callable(fn), name
