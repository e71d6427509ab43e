"""Oracle OUTPUT-TYPE lint (VERDICT r8 task 2).

Three rounds (r6-r8) were lost to ONE untyped oracle column:
``ivf_centroid_drift_report``'s ``n_new`` was DuckDB HUGEINT
(``sum(CASE WHEN..THEN 1 ELSE 0 END)`` types int128, and ``max``
propagates it) while the Spark side emitted BIGINT — values identical,
rows/schema green, value-hash red, because the driver's hash
serializes int128 differently from int64. Nothing checked the
DuckDB-side type surface the driver actually hashes; this test does,
so the class can never ship again: ``DESCRIBE <oracle>`` binds every
registered oracle (no execution) and every output column must come
from a closed allowlist of types whose serialization is shared with
Spark's.

The allowlist is deliberately tight — exactly the types the catalog
uses today plus DATE/TIMESTAMP/explicit DECIMAL. Widen it consciously,
not by reflex: FLOAT (float32) and the int128s stay banned because
their value serialization diverges from the Spark column they'd pair
with even when the math agrees.
"""

import re

import duckdb
import pytest

from currency_etl_pipeline_spark.queries import all_oracles
from tests.conftest import SF_DIR
from tests.oracle_harness import duck_connection

_ALLOWED = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    # r11's BIGINT[] widening is REVERTED (r12): the driver's real
    # harness canonicalizes through pandas sort_values, which
    # factorizes every column and dies on list cells ("unhashable
    # type: 'list'" — CORRECTNESS_r11 bpe_apply_encode). The lint
    # models the DRIVER's contract, not the local harness's: checked
    # outputs must be scalar. Array-valued results go out as
    # md5(array_to_string(..)) digests (see bpe_apply_encode).
}
_DECIMAL = re.compile(r"^DECIMAL\(\d+,\d+\)$")


def _type_ok(typ: str) -> bool:
    return typ in _ALLOWED or bool(_DECIMAL.match(typ))


def test_every_oracle_output_column_type_is_hash_safe():
    con = duck_connection(SF_DIR)
    violations = []
    for name, sql in all_oracles().items():
        # DESCRIBE binds/types the query without executing it — cheap
        # even for oracles that would take minutes to run.
        for col, typ, *_ in con.execute("DESCRIBE " + sql).fetchall():
            if not _type_ok(typ):
                violations.append((name, col, typ))
    assert not violations, (
        "oracle output columns with hash-unsafe DuckDB types "
        "(cast them — e.g. CAST(.. AS BIGINT); see module docstring): "
        f"{violations}"
    )


def test_lint_is_not_vacuous():
    """The lint must actually catch the r6-r8 failure shape: an
    unnormalized sum(CASE..) aggregate typing HUGEINT."""
    con = duckdb.connect()
    rows = con.execute(
        "DESCRIBE SELECT max(f) AS n_new FROM "
        "(SELECT sum(CASE WHEN x > 1 THEN 1 ELSE 0 END) AS f "
        " FROM (VALUES (1), (2)) t(x))"
    ).fetchall()
    assert rows[0][1] == "HUGEINT"  # DuckDB still types it int128
    assert not _type_ok(rows[0][1])


@pytest.mark.parametrize(
    "typ",
    ["HUGEINT", "UHUGEINT", "FLOAT", "UBIGINT", "BIGINT[]", "VARCHAR[]", "DOUBLE[]"],
)
def test_known_unsafe_types_rejected(typ):
    assert not _type_ok(typ)


def test_list_rejection_is_not_vacuous():
    """The lint must catch the r11 failure shape non-vacuously: a
    list-typed output column (the driver's pandas canonicalizer cannot
    factorize list cells)."""
    con = duckdb.connect()
    rows = con.execute("DESCRIBE SELECT list(x) AS ids FROM (VALUES (1), (2)) t(x)").fetchall()
    assert rows[0][1].endswith("[]")
    assert not _type_ok(rows[0][1])
