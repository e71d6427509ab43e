"""Local replica of the driver's correctness gate: run the Spark query
and its DuckDB oracle side by side, compare row count + column names +
order-insensitive values — but with EXACT value equality (strictly
stronger than a value hash)."""

from __future__ import annotations

import math

import duckdb

from currency_etl_pipeline_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    if isinstance(v, bool):
        return int(v)
    return v


def _rows(columns, records):
    """Column-name-sorted, canonicalized, row-sorted list of tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in records]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return sorted(columns), out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str):
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = [tuple(r) for r in rel.fetchall()]

    s_cols_sorted, s_canon = _rows(s_cols, s_rows)
    d_cols_sorted, d_canon = _rows(d_cols, d_rows)

    assert s_cols_sorted == d_cols_sorted, f"columns differ: spark={s_cols_sorted} duckdb={d_cols_sorted}"
    assert len(s_canon) == len(d_canon), f"row counts differ: spark={len(s_canon)} duckdb={len(d_canon)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} value mismatches; first 3: {mismatches[:3]} (cols {s_cols_sorted})"
