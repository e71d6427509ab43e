"""Sketch accuracy + stateful-streaming multi-batch behavior.

The HLL sketch has no cross-engine oracle (driver does rows-only), so
its accuracy contract lives here. The applyInPandasWithState operator
is oracle-checked on a single micro-batch by the driver; the multi-batch
test here is what proves the state actually carries across batches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from currency_etl_pipeline_spark.queries.stats import hll_user_cardinality
from currency_etl_pipeline_spark.streaming.pipeline import run_stream_to_memory
from currency_etl_pipeline_spark.streaming.stateful import first_seen_per_key
from currency_etl_pipeline_spark.tables import load_table


def test_hll_within_relative_error(spark, sf_dir):
    """The query now emits the bound VERDICT (hash-checked by the
    driver); this test keeps the RAW estimate honest by recomputing it
    independently — a vacuous always-true flag would pass the oracle
    but fail here."""
    rows = hll_user_cardinality(spark, sf_dir).collect()
    assert rows, "no groups"
    assert all(r.approx_within_5pct for r in rows)
    raw = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        )
        .collect()
    )
    for r in raw:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err < 0.05, f"{r.event_type}: {r.approx_users} vs {r.exact_users}"


def test_cms_bounds_hold(spark, sf_dir):
    """Count-min-sketch contract: estimates never undercount, and
    overcount by at most eps * N (eps = 0.005) at the configured
    confidence. The query emits these as verdict columns; here we
    assert the verdicts hold AND that exact_events matches an
    independent count (so the flags grade real estimates)."""
    from currency_etl_pipeline_spark.queries.stats import cms_user_event_counts

    rows = cms_user_event_counts(spark, sf_dir).collect()
    assert rows and any(r.exact_events > 0 for r in rows), "watchlist hit nothing"
    indep = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.cms_lower_ok, f"CMS undercounted user {r.user_id}"
        assert r.cms_upper_ok, f"CMS overcount past eps*N for user {r.user_id}"
        assert r.exact_events == indep.get(r.user_id, 0)


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """The approx_percentile scale twin must stay within a tight rank
    bound of the exact percentiles. The query now emits rank-interval
    verdicts (driver hash-checks them); this test recomputes the RAW
    sketch values and holds them to a 1% relative value bound vs exact
    — catching a mis-wired quantile or column that the looser in-query
    rank verdict might tolerate."""
    from currency_etl_pipeline_spark.queries import all_queries

    specs = all_queries()
    exact = {r["l_returnflag"]: r for r in specs["lineitem_percentiles"].spark(spark, sf_dir).collect()}
    verdicts = specs["lineitem_percentiles_approx"].spark(spark, sf_dir).collect()
    assert verdicts
    for v in verdicts:
        for col in ["median_qty_ok", "p90_qty_ok", "median_price_ok", "p99_price_ok"]:
            assert v[col], f"{v['l_returnflag']}.{col} verdict failed"
    approx = {
        r["l_returnflag"]: r
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("median_qty"),
            F.expr("approx_percentile(l_quantity, 0.9, 10000)").alias("p90_qty"),
            F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("median_price"),
            F.expr("approx_percentile(l_extendedprice, 0.99, 10000)").alias("p99_price"),
        )
        .collect()
    }
    assert set(exact) == set(approx) and exact
    for flag, e in exact.items():
        a = approx[flag]
        assert a["n"] == e["n"]
        for col in ["median_qty", "p90_qty", "median_price", "p99_price"]:
            rel = abs(a[col] - e[col]) / max(1e-9, abs(e[col]))
            assert rel < 0.01, f"{flag}.{col}: approx {a[col]} vs exact {e[col]}"


def test_first_seen_state_spans_micro_batches(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    # Write events as several files ordered so later batches contain
    # earlier timestamps for some keys (repartition round-robins rows),
    # then stream 1 file per trigger -> multiple micro-batches.
    src = str(tmp_path / "events_stream")
    ev.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_stream_to_memory(first_seen_per_key(stream), spark, output_mode="update")

    # Net effect (min emission per key) must equal the batch argmin.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("first_ts", "first_event_id")
    got = {
        (r.user_id, r.event_type): r.first_event_id
        for r in out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }
    wb = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    want = {
        (r.user_id, r.event_type): r.event_id
        for r in ev.withColumn("rn", F.row_number().over(wb)).filter("rn = 1").collect()
    }
    assert got == want

    # State must have suppressed re-emission for keys already at their
    # minimum: total emitted rows is bounded by batches x keys but must
    # be >= number of keys and < total events (i.e., real suppression).
    assert len(want) <= out.count() < ev.count()


def test_observe_metrics_ride_the_action(spark, sf_dir):
    """Observation metrics must (a) match a direct aggregate computed
    separately, (b) arrive from the SAME action that produced the
    result — no second scan of the input."""
    import pytest

    from currency_etl_pipeline_spark.operators.observe import (
        ingest_gate_metrics,
        observe_metrics,
    )
    from currency_etl_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    observed, obs = observe_metrics(docs, ingest_gate_metrics(docs))
    kept = observed.filter(F.length("text") > 0).count()
    got = obs.get
    direct = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.size(F.split(F.trim("text"), r"\s+")) < 10).cast("long")).alias("n_short_docs"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+")).cast("long")).alias("total_tokens"),
    ).collect()[0]
    assert got["n_rows"] == direct["n_rows"] == kept + docs.filter(F.length("text") == 0).count()
    assert got["n_short_docs"] == direct["n_short_docs"]
    assert got["total_tokens"] == direct["total_tokens"]
    with pytest.raises(ValueError):
        observe_metrics(docs, {})


def test_load_table_adapts_to_both_parquet_timestamp_units(spark, tmp_path):
    """The driver REGENERATES testdata each round and has shipped both
    TIMESTAMP(NANOS) (r1-r3: Spark reads the column as LONG under
    nanosAsLong) and micros-with-isAdjustedToUTC=false (r4+: surfaces
    as TimestampType instants with NTZ inference disabled). The
    streaming twin of this pin exists (test_nanos_stored_events_still_
    stream); this pins the BATCH reader: load_table must yield the
    same TimestampType values from either physical encoding, so a
    future unit flip cannot silently break the catalog between
    rounds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = 1704067200_000_000_000  # 2024-01-01T00:00:00Z in ns
    ns_vals = [t0, t0 + 3600 * 10**9 + 123_456_789, t0 + 2 * 3600 * 10**9]

    def write(d, unit):
        d.mkdir()
        ts = (
            pa.array(ns_vals, pa.timestamp("ns"))
            if unit == "ns"
            # micros file: truncate exactly like DuckDB's ns->us read
            else pa.array([v // 1000 for v in ns_vals], pa.timestamp("us"))
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([1, 2, 3], pa.int64()),
                    "ts": ts,
                    "user_id": pa.array([10, 10, 11], pa.int64()),
                    "event_type": pa.array(["view", "click", "view"]),
                    "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
                    "props": pa.array(["{}", "{}", "{}"]),
                }
            ),
            str(d / "events.parquet"),
            store_schema=False,
        )

    write(tmp_path / "ns", "ns")
    write(tmp_path / "us", "us")
    got = {}
    for unit in ("ns", "us"):
        df = load_table(spark, str(tmp_path / unit), "events")
        assert str(df.schema["ts"].dataType) == "TimestampType()", unit
        got[unit] = sorted(
            (r["event_id"], r["ts"].isoformat()) for r in df.select("event_id", "ts").collect()
        )
    assert got["ns"] == got["us"], (
        "the two physical encodings must load to identical instants"
    )
    # sub-microsecond precision is truncated (DIV), never rounded
    assert any("123456" in ts for _, ts in got["ns"]), got["ns"]
