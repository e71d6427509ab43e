"""The reference's fetch → transform → load path as composable Spark
transformations (SURVEY.md §2.A-§2.C; EP1).

Reference stages and their rewrite:

fetch (fetch.py:13-85)
    HTTP GET → JSON {success, source, quotes{PAIR: rate}} → pandas rows
    → CSV → GCS. Here: the payload (fetched driver-side — a single
    small dict, exactly like the reference) becomes one DataFrame row
    with a MapType quotes column, exploded JVM-side (S2). At
    poll-at-scale this plugs into Structured Streaming instead.

transform (transform.py:28-65)
    read CSV → to_numeric(coerce) → dropna → processed_at. Here:
    coerce_double + na.drop + session timestamp — same semantics
    (SURVEY.md §5 item 2), lazily composed, no intermediate files.

load (load_to_bigquery.py:28-120)
    read CSV → regex pair split → casts → project → tmp table → MERGE.
    Here: prepare_for_load projects/casts to the warehouse schema;
    Warehouse.upsert_current runs the MERGE rewrite. No staging
    materialization (S9/S10 collapse into a lazy plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from currency_etl_pipeline_spark.functions.scalars import (
    coerce_double,
    pair_split_regex,
    parse_timestamp,
)

# The declared warehouse schema (load_to_bigquery.py:57-63, README.md:94-100).
RATES_SCHEMA = T.StructType(
    [
        T.StructField("base_currency", T.StringType(), False),
        T.StructField("target_currency", T.StringType(), False),
        T.StructField("rate", T.DoubleType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("retrieved_at", T.TimestampType(), True),
    ]
)

_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("success", T.BooleanType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("quotes", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def quotes_payload_to_rates(
    spark: SparkSession,
    payload: dict,
    fetched_at: str,
    target_currency: str | None = None,
) -> DataFrame:
    """API payload → (pair, rate, base_currency, target_currency, timestamp).

    - success flag guard (fetch.py:33-34) raises like the reference;
    - quotes map exploded to rows JVM-side (S2, fetch.py:39-40);
    - target = suffix after the base (F2, fetch.py:44);
    - optional target filter (P1, fetch.py:47-48);
    - empty-result guard (P7, fetch.py:55-56);
    - `fetched_at` is an explicit literal, not now() — the engine keeps
      event time out of wall-clock hands (fixes F7's tz bug).

    Quote values enter as strings (API JSON numbers may be malformed in
    raw zone files); numeric coercion is transform's job.
    """
    if not payload.get("success", False):
        raise ValueError(f"API error response: {payload.get('error', payload)}")
    row = {
        "success": bool(payload.get("success")),
        "source": str(payload.get("source")),
        "quotes": {str(k): (None if v is None else str(v)) for k, v in (payload.get("quotes") or {}).items()},
    }
    df = spark.createDataFrame([row], schema=_PAYLOAD_SCHEMA)
    rates = df.select(
        F.lit(row["source"]).alias("base_currency"),
        F.explode("quotes").alias("pair", "rate"),
    ).select(
        "base_currency",
        "pair",
        "rate",
        F.expr("substr(pair, length(base_currency) + 1)").alias("target_currency"),
        F.to_timestamp(F.lit(fetched_at)).alias("timestamp"),
    )
    if target_currency is not None:
        rates = rates.filter(F.col("target_currency") == target_currency)
        if rates.isEmpty():
            raise ValueError(f"no rate found for {row['source']}->{target_currency}")
    return rates


def transform_rates(raw: DataFrame, processed_at: str) -> DataFrame:
    """Clean-zone transform (transform.py:39-46): numeric coercion with
    NULL-on-malformed, drop unparseable rows, stamp processed_at."""
    return (
        raw.withColumn("rate", coerce_double("rate"))
        .na.drop(subset=["rate"])
        .withColumn("processed_at", F.to_timestamp(F.lit(processed_at)))
    )


def prepare_for_load(clean: DataFrame, retrieved_at: str) -> DataFrame:
    """Warehouse projection (load_to_bigquery.py:41-54): regex pair
    split fallback when the split columns are absent, string casts,
    timestamp parse (NULL on failure), final column order, full-row
    na.drop — output conforms to RATES_SCHEMA."""
    df = clean
    if "base_currency" not in df.columns or "target_currency" not in df.columns:
        df = df.withColumn("base_currency", pair_split_regex("pair", 1)).withColumn(
            "target_currency", pair_split_regex("pair", 2)
        )
    ts = df.schema["timestamp"].dataType
    ts_col = F.col("timestamp") if isinstance(ts, T.TimestampType) else parse_timestamp("timestamp")
    return (
        df.select(
            F.col("base_currency").cast("string").alias("base_currency"),
            F.col("target_currency").cast("string").alias("target_currency"),
            coerce_double("rate").alias("rate"),
            ts_col.alias("timestamp"),
            F.to_timestamp(F.lit(retrieved_at)).alias("retrieved_at"),
        )
        .na.drop()
    )


def derive_cross_rates(snapshot: DataFrame, dedup_inverse: bool = False) -> DataFrame:
    """Cross-rate triangulation: from a snapshot of base→X rates (all
    sharing one base currency, the shape the API returns — fetch.py's
    `source=<base>` parameter), derive every X→Y cross rate as
    rate(base→Y) / rate(base→X). The reference's dashboard can only
    show pairs the API quoted directly (app.py's pair dropdown); this
    closes the classic gap — EUR→JPY from a GBP-sourced snapshot.

    Semantics:
    - one row per ordered (X, Y) pair, X != Y, both from the snapshot's
      target set; the shared base never appears as a target (base→X is
      already a direct rate, and base→base is 1 by definition);
    - the derived timestamp is the OLDER of the two legs (a cross rate
      is only as fresh as its stalest input);
    - both directions are emitted by default because consumers look up
      pairs directionally; ``dedup_inverse=True`` keeps only the
      lexicographically smaller direction (from < to) — half the rows
      when a consumer treats X→Y and Y→X as one quote (the inverse is
      1/cross_rate, identity pytest-pinned).

    Plan: a self-join of the snapshot on its base key — the snapshot is
    one row per target (bounded by the currency universe, ~200 rows at
    any scale), so this is broadcast-size on both sides and the
    quadratic blowup is ~40k rows, a constant. Per-row double division
    only; no shuffle beyond the tiny join.
    """
    a = snapshot.select(
        F.col("base_currency").alias("via"),
        F.col("target_currency").alias("from_currency"),
        F.col("rate").alias("rate_from"),
        F.col("timestamp").alias("ts_from"),
    )
    b = snapshot.select(
        F.col("base_currency").alias("via"),
        F.col("target_currency").alias("to_currency"),
        F.col("rate").alias("rate_to"),
        F.col("timestamp").alias("ts_to"),
    )
    pair_pred = (
        F.col("from_currency") < F.col("to_currency")
        if dedup_inverse
        else F.col("from_currency") != F.col("to_currency")
    )
    return (
        a.join(b, "via")
        .filter(pair_pred)
        .select(
            "from_currency",
            "to_currency",
            "via",
            (F.col("rate_to") / F.col("rate_from")).alias("cross_rate"),
            F.least("ts_from", "ts_to").alias("timestamp"),
        )
    )
