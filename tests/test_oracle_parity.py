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
