"""Core reference-semantics queries on the `events` table.

Mapping (FIXTURES.md §B): `events` is the rate-observation stream —
`(user_id, event_type)` ≈ `(base_currency, target_currency)` pair key,
`value` ≈ rate, `ts` ≈ observation timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.functions.scalars import coerce_double, ts_str
from currency_etl_pipeline_spark.operators.delta import pct_change_over_key, window_delta
from currency_etl_pipeline_spark.operators.topk import top_n
from currency_etl_pipeline_spark.operators.upsert import latest_per_key, upsert_newest_wins
from currency_etl_pipeline_spark.queries.registry import ANCHOR, query
from currency_etl_pipeline_spark.tables import load_table

KEYS = ["user_id", "event_type"]
TS_DUCK = "strftime(ts, '%Y-%m-%d %H:%M:%S.%f')"


@query(
    "latest_rate_per_key",
    oracle=f"""
    SELECT user_id, event_type, "value" AS rate, {TS_DUCK} AS ts_utc
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def latest_rate_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """current_rates snapshot: newest observation per pair key.

    Reference: MERGE-maintained current_rates (load_to_bigquery.py:98-111)
    read back at app.py:154-160. One shuffle on the key; row_number
    inside hash partitions (no global sort).
    """
    ev = load_table(spark, sf_dir, "events")
    snap = latest_per_key(ev, KEYS, "ts", tie_breakers=["event_id"])
    return snap.select("user_id", "event_type", F.col("value").alias("rate"), ts_str("ts").alias("ts_utc"))


@query(
    "current_snapshot_upsert",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_type, "value", ts, 1 AS prio FROM events WHERE event_id % 2 = 0
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    ), upd AS (
        SELECT user_id, event_type, "value", ts, 0 AS prio FROM events WHERE event_id % 2 = 1
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    ), merged AS (
        SELECT * FROM base UNION ALL SELECT * FROM upd
    )
    SELECT user_id, event_type, "value" AS rate, {TS_DUCK} AS ts_utc
    FROM merged
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, prio DESC) = 1
    """,
)
def current_snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newest-wins MERGE rewrite (J1-J3): snapshot of even-id events
    upserted with the odd-id batch; equal timestamps keep the existing
    row (the `S.timestamp > T.timestamp` rule, load_to_bigquery.py:102).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value", "ts", "event_id")
    base = latest_per_key(ev.filter(F.col("event_id") % 2 == 0), KEYS, "ts", ["event_id"]).drop("event_id")
    updates = ev.filter(F.col("event_id") % 2 == 1).drop("event_id")
    merged = upsert_newest_wins(base, updates, KEYS, "ts")
    return merged.select("user_id", "event_type", F.col("value").alias("rate"), ts_str("ts").alias("ts_utc"))


@query(
    "top1000_newest_events",
    oracle=f"""
    SELECT event_id, user_id, event_type, "value" AS rate, {TS_DUCK} AS ts_utc
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1000
    """,
)
def top1000_newest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard working set: global newest-N (T3, app.py:44-48 LIMIT 5000).

    Compiles to TakeOrderedAndProject: per-partition top-N heaps, no
    global sort/shuffle — the plan that survives 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    top = top_n(ev, ["ts", "event_id"], 1000, descending=True)
    return top.select("event_id", "user_id", "event_type", F.col("value").alias("rate"), ts_str("ts").alias("ts_utc"))


@query(
    "point_lookup_latest",
    oracle=f"""
    SELECT user_id, event_type, "value" AS rate, {TS_DUCK} AS ts_utc
    FROM events WHERE user_id = 7 AND event_type = 'purchase'
    ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
)
def point_lookup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3: latest rate for one pair key (app.py:152-160). The filter
    is pushed into the parquet scan; limit-1 top-k after it — unlike
    the reference's fetch-5000-then-filter dashboard wart (EP2), we
    filter below the limit."""
    ev = load_table(spark, sf_dir, "events")
    hit = ev.filter((F.col("user_id") == 7) & (F.col("event_type") == "purchase"))
    return top_n(hit, ["ts", "event_id"], 1, descending=True).select(
        "user_id", "event_type", F.col("value").alias("rate"), ts_str("ts").alias("ts_utc")
    )


@query(
    "filtered_topn_fixed_semantic",
    oracle=f"""
    SELECT event_id, user_id, event_type, "value" AS rate, {TS_DUCK} AS ts_utc
    FROM events WHERE user_id = 3 AND event_type = 'click'
    ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
)
def filtered_topn_fixed_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2 with the limit-then-filter wart FIXED (SURVEY.md §5 item 7):
    newest 100 *of the requested pair*, not pair rows within the global
    newest 100."""
    ev = load_table(spark, sf_dir, "events")
    hit = ev.filter((F.col("user_id") == 3) & (F.col("event_type") == "click"))
    return top_n(hit, ["ts", "event_id"], 100, descending=True).select(
        "event_id", "user_id", "event_type", F.col("value").alias("rate"), ts_str("ts").alias("ts_utc")
    )


@query(
    "trailing_24h_delta",
    oracle=f"""
    WITH w AS (
        SELECT * FROM events
        WHERE ts >= TIMESTAMP '2024-01-29 00:00:00' AND ts <= TIMESTAMP '2024-01-30 00:00:00'
    ), lat AS (
        SELECT user_id, event_type, "value" AS latest_value FROM w
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    ), ear AS (
        SELECT user_id, event_type, "value" AS earliest_value FROM w
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) = 1
    ), cnt AS (
        SELECT user_id, event_type, count(*) AS n_obs FROM w GROUP BY user_id, event_type
    )
    SELECT l.user_id, l.event_type,
           round(l.latest_value, 6) AS latest_value,
           round(e.earliest_value, 6) AS earliest_value,
           round(l.latest_value - e.earliest_value, 6) AS diff,
           round(CASE WHEN e.earliest_value <> 0
                      THEN (l.latest_value - e.earliest_value) / e.earliest_value * 100 END, 6) AS pct_change,
           CASE WHEN l.latest_value - e.earliest_value > 0 THEN 'increase'
                WHEN l.latest_value - e.earliest_value < 0 THEN 'decrease'
                ELSE 'no_change' END AS direction,
           c.n_obs
    FROM lat l
    JOIN ear e ON l.user_id = e.user_id AND l.event_type = e.event_type
    JOIN cnt c ON l.user_id = c.user_id AND l.event_type = c.event_type
    """,
)
def trailing_24h_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 24h-change email metric (F8-F10,
    fetch_transform_load_dag.py:111-148) — its TWO warehouse queries +
    Python subtraction fused into ONE scan + one shuffle, with the
    zero-division guard and the three-way direction CASE. Anchor is a
    literal (oracle rule 1)."""
    ev = load_table(spark, sf_dir, "events")
    return window_delta(ev, KEYS, "ts", "value", anchor=ANCHOR, lookback_hours=24)


@query(
    "pct_change_per_event",
    oracle=f"""
    WITH t AS (
        SELECT event_id, user_id, event_type, "value",
               {TS_DUCK} AS ts_utc,
               lag("value") OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS prev_value
        FROM events
    )
    SELECT event_id, user_id, event_type, ts_utc, "value" AS rate, prev_value,
           round(CASE WHEN prev_value <> 0 THEN ("value" - prev_value) / prev_value * 100 END, 6) AS pct_change
    FROM t WHERE prev_value IS NOT NULL
    """,
)
def pct_change_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row trend: pct change vs previous observation of the same key
    (the window-function generalization of F9, SURVEY.md §2.G)."""
    ev = load_table(spark, sf_dir, "events")
    out = pct_change_over_key(ev, KEYS, "ts", "value", tie_breakers=["event_id"])
    return out.select(
        "event_id", "user_id", "event_type", ts_str("ts").alias("ts_utc"),
        F.col("value").alias("rate"), "prev_value", "pct_change",
    )


@query(
    "props_extract_clean",
    oracle="""
    WITH t AS (
        SELECT event_id, user_id, event_type,
               try_cast(json_extract_string(props, '$.k') AS DOUBLE) AS k_value
        FROM events
    )
    SELECT event_id, CAST(user_id AS VARCHAR) AS user_key, event_type, k_value
    FROM t WHERE k_value IS NOT NULL
    """,
)
def props_extract_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning path (P4/F4/F5, transform.py:39-46): JSON field extract →
    numeric coercion (NULL on malformed, pandas errors='coerce') →
    na.drop → string cast. All JVM built-ins, no UDF."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_id",
        F.col("user_id").cast("string").alias("user_key"),
        "event_type",
        coerce_double(F.get_json_object("props", "$.k")).alias("k_value"),
    )
    return t.na.drop(subset=["k_value"])


@query(
    "pair_split_roundtrip",
    oracle="""
    WITH t AS (
        SELECT DISTINCT upper(substr(event_type, 1, 3)) AS base_code,
               upper(substr(reverse(event_type), 1, 3)) AS target_code
        FROM events
    ), p AS (
        SELECT base_code, target_code, base_code || target_code AS pair FROM t
    )
    SELECT pair,
           regexp_extract(pair, '([A-Z]{3})([A-Z]{3})', 1) AS base_re,
           regexp_extract(pair, '([A-Z]{3})([A-Z]{3})', 2) AS target_re,
           substr(pair, 4) AS target_sub,
           CAST(regexp_extract(pair, '([A-Z]{3})([A-Z]{3})', 1) = base_code
                AND substr(pair, 4) = target_code AS INT) AS roundtrip_ok
    FROM p
    """,
)
def pair_split_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-code split both ways (F2 substring ≡ F3 regex on 3-letter
    codes, SURVEY.md §5 item 6): build a 6-char pair, split via substring
    and via regex, assert they agree."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        F.upper(F.substring("event_type", 1, 3)).alias("base_code"),
        F.upper(F.substring(F.reverse("event_type"), 1, 3)).alias("target_code"),
    ).distinct()
    p = t.withColumn("pair", F.concat("base_code", "target_code"))
    base_re = F.regexp_extract("pair", r"([A-Z]{3})([A-Z]{3})", 1)
    target_re = F.regexp_extract("pair", r"([A-Z]{3})([A-Z]{3})", 2)
    target_sub = F.expr("substr(pair, 4)")
    return p.select(
        "pair",
        base_re.alias("base_re"),
        target_re.alias("target_re"),
        target_sub.alias("target_sub"),
        ((base_re == F.col("base_code")) & (target_sub == F.col("target_code"))).cast("int").alias("roundtrip_ok"),
    )


@query(
    "scd2_rate_history",
    oracle="""
    SELECT user_id, event_type,
           "value" AS rate,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    """,
)
def scd2_rate_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history reconstruction: each observation becomes a
    [valid_from, valid_to) interval per key via ``lead``, open-ended on
    the current row — the full-history complement of the newest-wins
    snapshot (J1-J3); together they are the reference's
    historical_rates + current_rates pair (SURVEY §1.1) derived from
    one event log in one pass.

    Plan: one shuffle on the key, one window sort — the interval build
    is embarrassingly parallel per key at any scale.
    """
    from pyspark.sql import Window

    from currency_etl_pipeline_spark.functions.scalars import ts_str

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.col("value").alias("rate"),
        ts_str("ts").alias("valid_from"),
        ts_str(nxt).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "cross_rate_triangulation",
    oracle="""
    WITH snap AS (
        SELECT user_id, event_type, "value" AS rate
        FROM events
        WHERE "value" > 0
        QUALIFY row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT a.event_type AS quote_a, b.event_type AS quote_b,
           CAST(count(*) AS BIGINT) AS n_bases,
           round(min(a.rate / b.rate), 6) AS min_cross,
           round(max(a.rate / b.rate), 6) AS max_cross,
           round(max(a.rate / b.rate) - min(a.rate / b.rate), 6) AS spread
    FROM snap a JOIN snap b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def cross_rate_triangulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangulated cross-rate consistency report: for every quote pair
    (t1, t2), each base u with a positive latest rate for both implies
    the cross rate t2→t1 = rate(u,t1)/rate(u,t2); in a consistent
    market every base implies the SAME cross, so the min/max spread per
    quote pair is the triangulation-arbitrage signal a rates desk
    monitors (reference domain: fetch.py pulls per-base quote maps —
    this is the cross-pair view those maps imply but the reference
    never materializes).

    Parity: the per-row double division is a single IEEE op on
    identical parquet inputs (deterministic in both engines); min/max
    are exact selections and the spread is one fixed-form subtraction
    of those selections — no multi-row double accumulation anywhere.
    The value > 0 guard pins the rate domain (a zero rate would divide
    by zero, where Spark doubles yield NULL but DuckDB yields inf —
    the documented cross-engine divergence).

    Plan/scale: ONE scan of events (the oracle's self-join would plan
    the snapshot subtree twice — the double-scan audit failure mode):
    the snapshot window rides one shuffle on (user_id, event_type),
    then the per-base quote list (≤ |quotes| = 5 entries) gathers on
    user_id and the pair expansion is a row-local array transform —
    linear in bases, never all-pairs across bases — feeding a
    ≤ |quotes|²-group agg with map-side partials. collect_list order
    is plan-dependent, which is safe here because the expansion
    enumerates ALL ordered pairs and min/max/count are
    order-insensitive. At 100 TB: same plan.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    snap = latest_per_key(ev, KEYS, "ts", tie_breakers=["event_id"]).select(
        "user_id", "event_type", F.col("value").alias("rate")
    )
    per_base = snap.groupBy("user_id").agg(
        F.collect_list(F.struct("event_type", "rate")).alias("qs")
    )
    pair_expr = """
        flatten(transform(qs, x ->
            filter(transform(qs, y ->
                CASE WHEN x.event_type < y.event_type
                     THEN named_struct('quote_a', x.event_type,
                                       'quote_b', y.event_type,
                                       'cross', x.rate / y.rate)
                END), p -> p IS NOT NULL)))
    """
    pairs = per_base.select(F.explode(F.expr(pair_expr)).alias("p")).select("p.*")
    return pairs.groupBy("quote_a", "quote_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_bases"),
        F.round(F.min("cross"), 6).alias("min_cross"),
        F.round(F.max("cross"), 6).alias("max_cross"),
        F.round(F.max("cross") - F.min("cross"), 6).alias("spread"),
    )
