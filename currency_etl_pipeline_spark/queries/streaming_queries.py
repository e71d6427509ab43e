"""Streaming catalog queries — real Structured Streaming executions,
hash-checked against batch SQL oracles where the semantics align
(complete-mode tumbling windows ≡ batch date_trunc aggregation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.streaming.pipeline import (
    events_stream,
    run_stream_to_memory,
    windowed_rates,
)


@query(
    "streaming_sliding_counts",
    oracle="""
    WITH w AS (
        SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
               event_type, "value"
        FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM w GROUP BY 1, 2
    """,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregation (2 h windows, 1 h slide):
    every event contributes to two overlapping windows. Driven to
    completion against the file source; complete-mode result must equal
    the batch rewrite where each row is duplicated into its two window
    start buckets (the oracle's unnest form).

    Plan: Structured Streaming expands each row to its window set
    map-side, then one stateful shuffle on (window, event_type). NOTE
    on state: this harness run uses complete mode (for oracle parity),
    where ALL window state is retained and the watermark evicts
    nothing. In production the same plan runs in append/update mode,
    where the 30-min watermark does evict expired windows and state is
    O(active windows × types), independent of stream length.

    Drive cost (r15 optimization): the fixture drive runs under 8
    state partitions (the r9 interval-join trim, extended to every
    JVM-stateful drive) — 32 state stores per micro-batch are pure
    per-epoch commit protocol at fixture scale; interleaved min-of-3
    at sf0.1 read 1.36 s → 1.02 s. Results are partitioning-invariant
    (pinned catalog-wide); production sizes state partitions by rate.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.functions.scalars import dec

    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return run_stream_to_memory(agg, spark, output_mode="complete", state_partitions=8)


@query(
    "streaming_sliding_counts_append",
    # Finality predicate: a (2 h, 1 h slide) window is emitted in
    # append mode iff the final watermark (max event time - 30 min,
    # reached after the engine's no-data flush batch) has passed its
    # END. ws + 2h vs wm never ties on this fixture (window ends are
    # exact hours, max ts carries seconds), so the emitted set is
    # deterministic at every sf regardless of <=-vs-< eviction
    # strictness.
    oracle="""
    WITH mx AS (
        SELECT max(ts) - INTERVAL 30 MINUTE AS wm FROM events
    ), w AS (
        SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
               event_type, "value"
        FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM w, mx
    WHERE ws + INTERVAL 2 HOUR <= mx.wm
    GROUP BY 1, 2
    """,
)
def streaming_sliding_counts_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION-mode twin of ``streaming_sliding_counts`` (r15):
    the same sliding-window plan driven in APPEND mode, where the
    30-minute watermark actually evicts state — each window is
    emitted exactly once, when the watermark passes its end, and the
    trailing not-yet-final windows are withheld. This is the mode the
    plan runs in at stream scale (state is O(active windows ×
    event types), independent of stream length); the complete-mode
    sibling retains ALL window state and exists for whole-history
    oracle parity. Pinning both modes hash-checked closes the gap the
    r14 review flagged: the scale-correctness claim ("watermark-
    evicted state in production") was a docstring, not a verified
    result.

    Determinism: for a static fixture the emitted set is a pure
    function of the data — after the last data batch the watermark is
    max(ts) - 30 min, and Structured Streaming's no-data flush batch
    (spark.sql.streaming.noDataMicroBatches.enabled, default true)
    finalizes every window whose end it passed; one
    processAllAvailable covers it (verified: identical result on
    repeated drives). The oracle applies the same finality predicate
    in batch SQL. Late-data semantics beyond eviction are exercised
    in tests/test_streaming.py, not here — the fixture file arrives
    as one batch, so nothing is late relative to the final watermark.

    Drive cost (r15 optimization): 8 state partitions for the fixture
    drive (see the complete-mode sibling); interleaved min-of-3 at
    sf0.1 read 2.01 s → 1.44 s, results partitioning-invariant.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.functions.scalars import dec

    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return run_stream_to_memory(agg, spark, output_mode="append", state_partitions=8)


def streaming_window_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches inside STATEFUL streaming: per tumbling hour and event
    type, the HyperLogLog++ distinct-user estimate computed on a live
    stream — the composition a real-time dashboard needs (exact
    streaming count-distinct would keep every distinct key in state;
    the sketch keeps ~1.5 KB per group, mergeable across micro-batches
    by construction, which is exactly why it is the only viable form
    at stream scale). This is the raw surface; the registered
    ``streaming_window_approx_users`` wraps it in a hash-checkable
    bound verdict (sketch values are engine-specific, so the estimate
    itself has no DuckDB twin).

    tests/test_streaming.py pins the STRICT contracts on this raw
    form: (a) the estimate against the batch exact distinct per window
    within 5%, and (b) streaming == batch-sketch equality — HLL
    register merges are commutative maxes, so the estimate is
    identical no matter how micro-batches sliced the stream.
    """
    from pyspark.sql import functions as F

    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "approx_users",
        )
    )
    return run_stream_to_memory(agg, spark, output_mode="complete", state_partitions=8)


@query(
    "streaming_window_approx_users",
    # The sketch-verdict pattern (ivf_ann_topk_trained precedent,
    # r11): the ESTIMATE has no DuckDB twin, but the CONTRACT does —
    # one row per (hour window, event_type), estimate within the HLL
    # envelope of the exact distinct count. The oracle states the
    # expected verdict for exactly that row set.
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           TRUE AS within_bound
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def streaming_window_approx_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound verdict over ``streaming_window_user_sketch`` (r12 —
    rows-only floor shrunk to the 2 media stubs): per (window,
    event_type), TRUE iff the streamed HLL estimate sits within
    max(3, 10% of exact) of the batch exact distinct count. The join
    is FULL OUTER with null-verdict=false, so a window the stream
    dropped, or one it invented, fails the hash as a false/extra row
    instead of vanishing from an inner join. The bound is deliberately
    looser than the pytest pin's 5% (rsd=0.02 sketches are near-exact
    at fixture cardinalities; the driver check must stay stable across
    sf0.001-0.1, where tiny windows make the relative error lumpy —
    the strict contract lives in test_streaming.py).

    Key symmetry (r13, ADVICE): the exact side buckets hours with the
    SAME device as the stream — ``F.window('ts', '1 hour')`` — not
    ``date_trunc``: window starts are epoch-aligned while date_trunc
    truncates session-timezone wall clocks, so in a fractional-offset
    zone (+05:30/+05:45) the formatted keys would end :30/:45 vs :00
    and nothing would join. Null-ts rows are filtered symmetrically on
    both sides and in the oracle (a streaming event-time aggregation
    can never observe them; the batch sides must not either).

    Drive cost (r15 optimization): the sketch drive runs under 8 state
    partitions (streaming_window_user_sketch; interleaved min-of-3 at
    sf0.1 read 2.47 s → 2.01 s, results partitioning-invariant)."""
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.tables import load_table

    raw = streaming_window_user_sketch(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    exact = ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    ).select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "exact_users",
    )
    return raw.join(exact, ["window_start", "event_type"], "full_outer").select(
        "window_start",
        "event_type",
        F.coalesce(
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(3), F.col("exact_users") * 0.1),
            F.lit(False),
        ).alias("within_bound"),
    )


@query(
    "streaming_stateful_first_seen",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
           "value" AS first_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) = 1
    """,
)
def streaming_stateful_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: streaming
    first-occurrence dedup per (user_id, event_type), state = the
    running (ts, event_id) minimum (streaming/stateful.py). The update
    stream's net effect must equal the batch row_number()=1 oracle.

    The final min-dedup over the memory sink collapses superseded
    emissions when the source delivers multiple micro-batches (one
    parquet file here → one batch, but the operator does not assume
    that)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.functions.scalars import ts_str
    from currency_etl_pipeline_spark.streaming.stateful import first_seen_per_key

    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    out = run_stream_to_memory(first_seen_per_key(stream), spark, output_mode="update")
    w = Window.partitionBy("user_id", "event_type").orderBy("first_ts", "first_event_id")
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "event_type",
            "first_event_id",
            ts_str("first_ts").alias("first_ts"),
            "first_value",
        )
    )


@query(
    "streaming_enrich_static_dim",
    oracle="""
    SELECT r.r_name, e.event_type,
           count(*) AS n_events,
           CAST(sum(CAST(e."value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN region r ON e.user_id % 5 = r.r_regionkey
    GROUP BY r.r_name, e.event_type
    """,
)
def streaming_enrich_static_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    broadcast dimension (region, via the deterministic user→region
    assignment), then aggregated — the streaming form of the
    reference's symbols-dim lookup (app.py:62-85, SURVEY §2.A S12/§2.D
    J4). Complete-mode result must equal the batch join+agg oracle.

    Plan: the static side is read once per micro-batch and broadcast —
    no state for the join itself; only the downstream agg is stateful.
    At 100 TB the dim stays broadcast-size by definition (dims grow
    with entities, not events), so this shape is scale-stable.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.functions.scalars import dec
    from currency_etl_pipeline_spark.tables import load_table

    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    region = F.broadcast(load_table(spark, sf_dir, "region").select("r_regionkey", "r_name"))
    joined = stream.join(region, F.pmod("user_id", F.lit(5)) == F.col("r_regionkey"))
    agg = joined.groupBy("r_name", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )
    # r15: 8 state partitions for the fixture drive (min-of-3 at sf0.1
    # 1.34 s -> 0.91 s; results partitioning-invariant).
    return run_stream_to_memory(agg, spark, output_mode="complete", state_partitions=8)


@query(
    "streaming_interval_join",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           p."value" AS purchase_value
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join with an event-time interval condition:
    clicks joined to same-user purchases in the trailing hour, both
    sides live streams with watermarks — the streaming twin of the
    batch ``purchases_within_1h_before_click`` (whose batch plan
    buckets the same predicate). Completes §2.I: tumbling, sliding,
    stateful, stream-static, foreachBatch, and now stream-stream.

    Plan: both sides shuffle on user_id; the interval condition plus
    the two 30-min watermarks bound the join state — each side buffers
    only rows inside [watermark - 1 h, now] per user, so state is
    O(rate × window), independent of stream length. Inner joins emit
    eagerly on match (the watermark governs state eviction, not
    emission), so driving the file stream to completion yields exactly
    the batch inner join — which is the oracle.

    Drive cost (r11, the left-outer twin's r9 trim applied here): the
    fixture drive is dominated by per-micro-batch state-store commits —
    32 shuffle partitions mean 2×32 state stores checkpointed per
    batch. The drive starts under 8 state partitions
    (run_stream_to_memory's ``state_partitions``); results are
    partitioning-invariant, production sizes state by rate.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.functions.scalars import ts_str

    clicks = (
        events_stream(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        events_stream(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("c_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("p_ts") <= F.col("c_ts")),
        "inner",
    ).select(
        "click_id",
        "user_id",
        "purchase_id",
        ts_str("c_ts").alias("click_ts"),
        ts_str("p_ts").alias("purchase_ts"),
        "purchase_value",
    )
    return run_stream_to_memory(joined, spark, output_mode="append", state_partitions=8)


@query(
    "streaming_dedup_union",
    oracle="""
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_utc, "value"
    FROM events
    """,
)
def streaming_dedup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT dedup: two identical live streams of the events
    table unioned (every record arrives twice, possibly in different
    micro-batches) then ``dropDuplicates`` on event_id — the streaming
    half of the dedup family (`exact_dedup_documents` is the batch
    half). Driven to completion the output is exactly one row per
    event (the oracle is the plain events table).

    Plan: one shuffle on event_id; the seen-keys set lives in the
    state store keyed by event_id. Unbounded-history dedup state grows
    with distinct keys — production bounds it with
    ``dropDuplicatesWithinWatermark`` once an event-time column rides
    along (same plan, watermark-evicted state), which is the 100 TB
    configuration; the exact form here is what the oracle can check.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.functions.scalars import ts_str

    def side() -> DataFrame:
        return events_stream(spark, f"{sf_dir}/events.parquet").select(
            "event_id", "user_id", "event_type", "ts", "value"
        )

    deduped = (
        side().unionByName(side())
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "event_type", ts_str("ts").alias("ts_utc"), "value")
    )
    # r15: 8 state partitions for the fixture drive (min-of-3 at sf0.1
    # 1.52 s -> 1.27 s; results partitioning-invariant).
    return run_stream_to_memory(deduped, spark, output_mode="append", state_partitions=8)


@query(
    "streaming_hourly_rates",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           round(CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An ACTUAL Structured Streaming run (file source → watermark →
    tumbling 1h windows → memory sink, driven to completion) whose
    complete-mode result must equal the batch date_trunc aggregation —
    the streaming generalization of the reference's poll loop
    (app.py:23-25) with exact-sum semantics."""
    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    agg = windowed_rates(stream, window="1 hour", watermark="30 minutes")
    # r15: 8 state partitions for the fixture drive (min-of-3 at sf0.1
    # 1.38 s -> 0.98 s; results partitioning-invariant).
    return run_stream_to_memory(agg, spark, output_mode="complete", state_partitions=8)


@query(
    "streaming_sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, "value",
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s,
               event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, "value",
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           count(*) AS n_events,
           CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
)
def streaming_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING gap-based sessionization: the exact
    ``session_window`` plan of the batch `event_sessionization` query
    run as a real Structured Streaming job (file source → watermark →
    session windows → memory sink, driven to completion) — proving the
    batch query's docstring claim that it "runs unchanged under
    Structured Streaming". Same lag/flag/cumsum oracle as the batch
    twin; the complete-mode result must match it row for row.

    Plan: one shuffle on user_id (the session key); open sessions live
    in the state store keyed by (user_id, window) and MERGE when a new
    event falls inside an existing window's [start, end+gap). In
    production (append/update mode) the 30-min watermark closes and
    evicts sessions whose end precedes it, so state is O(active
    sessions), independent of stream length; complete mode here only
    serves the oracle comparison.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.functions.scalars import dec, ts_str

    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
            F.min("ts").alias("start_ts"),
        )
        .select(
            "user_id",
            ts_str("start_ts").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
    # r15: 8 state partitions for the fixture drive (min-of-3 at sf0.1
    # 1.80 s -> 1.56 s; results partitioning-invariant).
    return run_stream_to_memory(agg, spark, output_mode="complete", state_partitions=8)


def _ingest_oracle() -> str:
    from currency_etl_pipeline_spark.functions.redact import (
        pii_counts_duck,
        redact_pii_duck,
    )

    from currency_etl_pipeline_spark.queries.text import gate_duck, quality_duck

    ne, np_, ni = pii_counts_duck("text")
    q = quality_duck("toks")
    gate = gate_duck("toks")
    return f"""
    WITH t AS (
        SELECT doc_id, lang, source, n_chars,
               regexp_split_to_array(trim(text), '\\s+') AS toks,
               md5(regexp_replace(lower(trim({redact_pii_duck("text")})), '\\s+', ' ', 'g'))
                 AS fingerprint,
               CAST({ne} + {np_} + {ni} AS INT) AS pii_hits
        FROM documents
    )
    SELECT doc_id, lang, source, fingerprint, pii_hits,
           len(toks) AS n_tokens,
           round({q}, 6) AS quality_score
    FROM t
    WHERE {gate}
    """


@query("streaming_corpus_ingest", oracle=_ingest_oracle())
def streaming_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING training-corpus ingest gate: documents arrive on two
    identical file streams (every doc delivered at least twice,
    possibly across micro-batches), pass the blended quality gate, and
    dropDuplicates on doc_id emits each surviving document exactly
    once, its normalized-text fingerprint attached. The batch oracle
    is the gated single-copy corpus.

    The gate composes the PII redaction operator (functions/redact.py):
    the fingerprint is computed over the REDACTED text — two documents
    identical up to their PII must collapse downstream — and a
    pii_hits count rides along so the batch stage can quarantine
    PII-heavy documents. The fixture corpus carries no organic PII, so
    here the redaction is structurally exercised but value-neutral;
    its value semantics are adjudicated non-vacuously by
    ``redact_pii_documents``'s grafted oracle and the unit tests.

    The delivery dedup deliberately keys on doc_id, NOT the
    fingerprint: streaming dropDuplicates keeps an arbitrary
    first-arrival, so collapsing DISTINCT documents that share a
    fingerprint would be nondeterministic (and unverifiable against
    any oracle). Cross-document fingerprint collapse belongs to the
    batch dedup stage (`training_shard_prep`), where min-doc_id keeper
    semantics are expressible; this stage guarantees exactly-once
    ingestion and ships the fingerprint the batch stage needs.

    Plan: the gate (tokenizer + score) and the md5 fingerprint are
    stateless map-side codegen on each micro-batch; the only stateful
    op is the dedup shuffle keyed by doc_id — state is one key per
    unique document, never the text. In production the same plan
    bounds state with dropDuplicatesWithinWatermark once an
    ingest-time column rides along.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.functions.redact import pii_counts, redact_pii
    from currency_etl_pipeline_spark.queries.text import (
        blended_quality,
        corpus_gate,
        tokens,
    )
    from currency_etl_pipeline_spark.tables import load_table

    schema = load_table(spark, sf_dir, "documents").schema

    def side() -> DataFrame:
        # File-source streams require a directory: stream the sf dir
        # with a glob pinned to the one table file (events_stream's
        # pattern, streaming/pipeline.py:129-134).
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )

    n_tokens = F.size(tokens())
    q = F.round(blended_quality(), 6)
    norm = F.regexp_replace(F.lower(F.trim(redact_pii(F.col("text")))), r"\s+", " ")
    ne, np_, ni = pii_counts(F.col("text"))

    def gated(stream: DataFrame) -> DataFrame:
        return (
            stream.withColumn("quality_score", q)
            .filter(corpus_gate())
            .select(
                "doc_id", "lang", "source",
                F.md5(norm).alias("fingerprint"),
                (ne + np_ + ni).alias("pii_hits"),
                n_tokens.alias("n_tokens"),
                "quality_score",
            )
        )

    deduped = gated(side().unionByName(side())).dropDuplicates(["doc_id"])
    # r15: 8 state partitions for the fixture drive (min-of-3 at sf0.1
    # 1.56 s -> 1.23 s; results partitioning-invariant).
    return run_stream_to_memory(deduped, spark, output_mode="append", state_partitions=8)


def _contam13_oracle() -> str:
    from currency_etl_pipeline_spark.queries.llm_prep import _CONTAM13_ORACLE

    return _CONTAM13_ORACLE


@query("streaming_contamination_gate", oracle=_contam13_oracle())
def streaming_contamination_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of `contamination_13gram` (same oracle — single
    source of truth, the _CDC_ORACLE precedent): held-out documents
    arrive on a live stream and are graded IN FLIGHT against the train
    split's static 13-gram digest vocabulary — the admission gate an
    eval-ingestion service runs so a benchmark set can never be
    published against a corpus it leaks into. Driven to completion the
    per-test-doc report (window count, train collisions, verdict bit)
    must equal the batch scan's row for row, however micro-batches
    sliced the corpus.

    Plan: the digest explode is stateless map-side codegen on each
    micro-batch; the train vocabulary is a STATIC relation, so the
    stream-static left join is stateless too (broadcast or shuffled by
    Catalyst's choice — no state store); the only stateful operator is
    the per-doc_id aggregation, whose state is three counters per
    held-out document — never a gram, never text. A stream-static
    join re-evaluates the static plan EVERY micro-batch, so the train
    vocabulary — the full-corpus window explode, the most expensive
    subtree here — is persisted and materialized BEFORE start() and
    released after the drive (r14, ADVICE r13: without this the
    explode ran once per micro-batch); this is the in-session form of
    the persisted digest index a production gate reads
    (sources/dedup_index.py's pattern). Window identities are 8-byte
    rolling-hash longs (r14), so the cached vocabulary and every
    join-side row are fixed-width and narrow. Append mode + watermark
    would bound the report in production; complete mode here serves
    the oracle comparison.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.queries.llm_prep import _gram_digests_from, _split_expr
    from currency_etl_pipeline_spark.queries.text import exploded, token_hashes
    from currency_etl_pipeline_spark.tables import load_table, spread

    docs = load_table(spark, sf_dir, "documents")
    t = spread(docs.select("doc_id", "text")).select(
        "doc_id", _split_expr().alias("split"), token_hashes().alias("tv")
    )
    train_grams = (
        exploded(t.filter(F.col("split") == "train"), [], _gram_digests_from(F.col("tv"), 13), "gram")
        .distinct()
        .withColumn("seen", F.lit(1))
        .persist()
    )
    try:
        train_grams.count()  # materialize the vocabulary once, pre-stream

        stream = (
            spark.readStream.schema(docs.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
        test = (
            stream.select("doc_id", _split_expr().alias("split"), "text")
            .filter(F.col("split") == "test")
            .select("doc_id", token_hashes().alias("tv"))
        )
        grams = (
            test.select(
                "doc_id", F.explode_outer(_gram_digests_from(F.col("tv"), 13)).alias("gram")
            )
            .filter(F.col("gram").isNotNull())
        )
        hit = F.when(F.col("seen").isNotNull(), 1).otherwise(0)
        agg = (
            grams.join(train_grams, "gram", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_windows"),
                F.sum(hit).cast("long").alias("n_contaminated"),
                (F.sum(hit) > 0).alias("is_contaminated"),
            )
        )
        return run_stream_to_memory(agg, spark, output_mode="complete", state_partitions=8)
    finally:
        train_grams.unpersist()


def _subpass_gate_oracle() -> str:
    from currency_etl_pipeline_spark.queries.llm_prep import _subpassage_oracle

    return _subpassage_oracle(gate=True)


def run_subpassage_gate(
    spark: SparkSession,
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    incoming_static: DataFrame,
    w: int | None = None,
) -> DataFrame:
    """Core of `streaming_subpassage_gate`, reusable against any
    docs stream (tests drive it with multi-file landed zones to pin
    chunking invariance): ``stream_docs`` is the live (doc_id, text)
    feed of incoming documents, ``corpus_docs`` the static
    already-ingested corpus whose window vocabulary gates admission,
    ``incoming_static`` a batch-side copy of the same incoming docs
    for the rewrite join (a production service rewrites at write time
    from the payload it already holds). Returns the
    `_subpassage_oracle(gate=True)` report shape. See the query
    docstring for the plan."""
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.queries.llm_prep import (
        _SUBPASS_W,
        _apply_spans,
        merged_spans,
    )
    from currency_etl_pipeline_spark.queries.text import (
        exploded,
        rolled_window_hashes,
        token_hashes,
    )

    w = _SUBPASS_W if w is None else w
    trimmed = F.trim(F.coalesce(F.col("text"), F.lit(""))).alias("text")
    corpus = corpus_docs.select("doc_id", trimmed)
    vocab = (
        exploded(
            corpus.select(token_hashes().alias("tv")),
            [],
            rolled_window_hashes(F.col("tv"), w),
            "h",
        )
        .distinct()
        .persist()
    )
    try:
        vocab.count()  # materialize the corpus vocabulary once, pre-stream

        incoming = stream_docs.select("doc_id", trimmed).select(
            "doc_id", token_hashes().alias("tv")
        )
        kw = (
            incoming.select(
                "doc_id",
                F.posexplode_outer(rolled_window_hashes(F.col("tv"), w)).alias(
                    "widx", "h"
                ),
            )
            .filter(F.col("h").isNotNull())
        )
        hits = kw.join(vocab, "h", "left_semi")
        agg = hits.groupBy("doc_id").agg(F.collect_list("widx").alias("hit_widx"))
        driven = run_stream_to_memory(
            agg, spark, output_mode="complete", state_partitions=8
        )
    finally:
        vocab.unpersist()

    per_doc = driven.select(
        "doc_id",
        F.sort_array(merged_spans(F.sort_array(F.col("hit_widx")), w)).alias("spans"),
    ).select(
        "doc_id",
        "spans",
        F.size("spans").cast("long").alias("n_dup_spans"),
        F.aggregate(
            "spans", F.lit(0).cast("long"), lambda acc, s: acc + (s["e"] - s["s"])
        ).alias("n_removed_words"),
    )
    return _apply_spans(incoming_static.select("doc_id", trimmed), per_doc)


@query("streaming_subpassage_gate", oracle=_subpass_gate_oracle())
def streaming_subpassage_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING admission twin of `subpassage_dedup_rewrite` (r14,
    VERDICT r13 task 8 — the decontamination family already had its
    batch+streaming pair; this completes the same symmetry for
    ExactSubstr sub-passage dedup): incoming (test-split) documents
    arrive on a live stream and every >= 16-word run that already
    occurs ANYWHERE in the ingested (train-split) corpus is detected
    in flight — the operator a live ingestion service actually runs,
    where the corpus is the past and retroactive global ranking is
    impossible. The report shares `_subpassage_oracle`'s exact shape
    (n_words / n_dup_spans / n_removed_words / clean_text per doc),
    with the gate's hit predicate: a window is a hit when its content
    occurs in the corpus vocabulary, every occurrence (not only
    non-first — the corpus copy is by definition earlier).

    Plan: window identities are 8-byte rolling-hash longs end to end
    (token_hashes projected once per side, rolled per micro-batch
    map-side); the corpus-side window vocabulary is persisted and
    materialized BEFORE start() (the stream-static join re-evaluates
    the static plan per micro-batch — the contamination gate's ADVICE
    fix, same device as the persisted `dedup_index` a production gate
    reads); the stream-static join is stateless, and the only
    stateful operator is the per-doc collect of hit window POSITIONS
    — integers, never a window hash row per state entry, never text.
    The span merge (gaps-and-islands as an array fold — window
    functions don't exist on streams) and the clean-text rewrite are
    batch post-processing on the driven result joined back to the
    static test docs: the decision state stays digest-only, the text
    is touched exactly once at rewrite time.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.queries.llm_prep import _split_expr
    from currency_etl_pipeline_spark.tables import load_table, spread

    docs = load_table(spark, sf_dir, "documents")
    base = spread(docs.select("doc_id", "text")).select(
        "doc_id", _split_expr().alias("split"), "text"
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    test_stream = (
        stream.select("doc_id", _split_expr().alias("split"), "text")
        .filter(F.col("split") == "test")
        .select("doc_id", "text")
    )
    return run_subpassage_gate(
        spark,
        test_stream,
        base.filter(F.col("split") == "train").select("doc_id", "text"),
        base.filter(F.col("split") == "test").select("doc_id", "text"),
    )


_RAW_ZONE_ORACLE = """
    SELECT * FROM (VALUES
      ('GBP', 'GBPEUR', '1.1702', 'EUR', '2024-03-01 10:00:00', 'poll_0001.json', NULL),
      ('GBP', 'GBPNUL', NULL,     'NUL', '2024-03-01 10:00:00', 'poll_0001.json', NULL),
      ('GBP', 'GBPUSD', '1.2645', 'USD', '2024-03-01 10:00:00', 'poll_0001.json', NULL),
      ('USD', 'EURUSD', '1.09',   NULL,  '2024-03-01 11:00:00', 'poll_0002.json', NULL),
      ('USD', 'USDEGP', '48.1',   'EGP', '2024-03-01 11:00:00', 'poll_0002.json', NULL),
      (NULL, NULL, NULL, NULL, NULL, 'poll_0003.json', 'API error: timeout'),
      (NULL, NULL, NULL, NULL, NULL, 'poll_0004.json', 'unreadable payload: malformed JSON'),
      (NULL, NULL, NULL, NULL, NULL, 'poll_0005.json', 'malformed payload: no source'),
      (NULL, NULL, NULL, NULL, NULL, 'poll_0006.json', 'malformed payload: no quotes')
    ) AS t(base_currency, pair, rate, target_currency, fetched_at, payload_file, err)
"""


@query("streaming_rates_raw_zone_tail", oracle=_RAW_ZONE_ORACLE)
def streaming_rates_raw_zone_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAIL-ABLE raw-zone ingest (the reference's 60 s poll loop over
    timestamp-named landed payload files, app.py:23-25 + fetch.py:74,
    as a Structured Streaming file source): a deterministic raw zone
    of six payload files — happy path, numeric/unprefixed quotes, a
    failed poll, unparseable JSON, a source-less payload, an
    empty-quotes payload — is landed and TAILED with
    ``stream_rates_raw_zone`` (sources/rates_datasource.py), which
    emits the batch ``currency_rates`` contract: exploded quote rows
    plus one quarantine err row per degenerate payload. The oracle is
    the literal expected relation, so the driver hash-checks the whole
    taxonomy end to end; batch-path equivalence over a SHARED zone is
    additionally pinned in tests/test_streaming.py.

    Plan/scale: stateless map-side codegen (from_json + CASE + one
    conditional explode) — no watermark, no state store; the file
    source checkpoints which files were processed, so the tail is
    exactly-once per payload file and `maxFilesPerTrigger` bounds a
    deep backlog. Unlike the POSIX-bound batch Python reader, this
    path rides Hadoop FS — object-store raw zones work unchanged.
    """
    import json
    import tempfile

    from currency_etl_pipeline_spark.sources.rates_datasource import (
        stream_rates_raw_zone,
    )

    zone = tempfile.mkdtemp(prefix="rates_raw_zone_")
    payloads = {
        "poll_0001.json": {
            "success": True,
            "source": "GBP",
            "fetched_at": "2024-03-01 10:00:00",
            "quotes": {"GBPUSD": "1.2645", "GBPEUR": "1.1702", "GBPNUL": None},
        },
        "poll_0002.json": {
            "success": True,
            "source": "USD",
            "fetched_at": "2024-03-01 11:00:00",
            # numeric quote (string-coerced) + a pair not prefixed by
            # the base (target stays NULL, the batch reader's rule)
            "quotes": {"USDEGP": 48.1, "EURUSD": "1.09"},
        },
        "poll_0003.json": {"success": False, "error": "timeout"},
        "poll_0005.json": {"success": True, "source": "", "quotes": {"X": "1"}},
        "poll_0006.json": {"success": True, "source": "GBP", "quotes": {}},
    }
    import os

    for fname, payload in payloads.items():
        with open(os.path.join(zone, fname), "w") as fh:
            json.dump(payload, fh)
    with open(os.path.join(zone, "poll_0004.json"), "w") as fh:
        fh.write("{not json")

    return run_stream_to_memory(
        stream_rates_raw_zone(spark, zone), spark, output_mode="append"
    )


@query(
    "streaming_interval_join_left_outer",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           p."value" AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts
    """,
)
def streaming_interval_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT-OUTER interval join — the attribution query
    the inner variant can't answer: every click, WITH its trailing-1h
    same-user purchases when they exist and a NULL purchase side when
    none arrived. Unlike the inner join (which emits eagerly on match),
    the unmatched-left rows can only be emitted once the WATERMARK has
    passed the click's whole match window — before that a matching
    purchase could still arrive — so null emission is watermark-driven
    by construction.

    The fixture stream is finite, and a finite stream's watermark never
    passes its own tail: the last window of unmatched clicks would stay
    buffered forever. A production tail has the same property between
    polls; the standard remedy is exactly what this query does — TAIL a
    mutable zone (a symlink to the fixture file, then two far-future
    FLUSH sentinel files with a reserved negative user landed on
    successive polls). Each new batch applies the previous batch's
    watermark, so the first sentinel batch releases everything below
    (real max − delay − interval) and the second releases the rest.
    Sentinel rows are removed from the RESULT TABLE after the run, not
    by a filter inside the streaming plan: Catalyst pushes a
    deterministic `user_id >= 0` below the EventTimeWatermark into the
    parquet scan, whose row-group stats (sentinel files are all
    negative ids) then skip the flush files entirely — the sentinels
    never reach the watermark and nothing flushes. (Found the hard
    way; the post-hoc batch filter keeps the watermark path intact.)

    Plan/state: both sides shuffle on user_id; watermark (30 min) plus
    the 1 h interval bound the buffered state to O(rate × window) per
    side — stream length never accumulates. The oracle is the batch
    LEFT JOIN over the same predicate; watermark EVICTION (late rows
    actually dropped) is pinned separately in test_streaming.py.

    Drive cost (VERDICT r8 task 8; r15 task 4): the bench row used to
    be ~60% protocol, not engine — each sentinel landed via a full
    Spark write job (~5 s apiece) and the stream checkpointed 32
    state-store partitions per side per micro-batch. The sentinels are
    now written driver-side with pyarrow (2 rows, milliseconds), and
    the query starts under 4 shuffle/state partitions (set before
    ``start()``, which is when Structured Streaming pins state
    partitioning into the checkpoint, restored after ``stop()``) —
    results are partitioning-invariant, only the per-batch
    store-commit overhead changes; production sizes state partitions
    by rate, not by this fixture. r16 epoch telemetry at sf0.1: 8→4
    cut per-epoch state commitMs 2.4-2.9 s → 0.6-0.8 s (summed across
    the 2×partitions stores), epoch median 0.85 → 0.65 s, timed drive
    5.4 → 4.3 s; 2 partitions measured within noise of 4 and was
    rejected to keep data-batch parallelism headroom.
    """
    import datetime as dt
    import os
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.functions.scalars import ts_str

    # Mutable tail zone: symlink the immutable fixture in, land flush
    # files later. The stream's schema is the RAW file schema (nanos ts
    # arrives as long — events_stream converts after the scan), so the
    # sentinel files are written with that same raw schema.
    zone = tempfile.mkdtemp(prefix="events_tail_zone_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), f"{zone}/events.parquet")
    probe = events_stream(spark, f"{sf_dir}/events.parquet")  # pins confs
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ts_is_long = any(
        f.name == "ts" and isinstance(f.dataType, T.LongType) for f in raw_schema.fields
    )
    del probe

    def land_flush(i: int, ts_iso: str) -> None:
        # Driver-side pyarrow write — 2 rows don't need a Spark job.
        # ts matches the fixture's physical type: int64 nanos when the
        # raw schema reads long (nanosAsLong), else timestamp[us].
        when = dt.datetime.fromisoformat(ts_iso + "+00:00")
        epoch_ns = int(when.timestamp() * 1_000_000_000)
        ts_arr = (
            pa.array([epoch_ns, epoch_ns], type=pa.int64())
            if ts_is_long
            else pa.array([when, when], type=pa.timestamp("us", tz="UTC"))
        )
        cols = {
            "event_id": pa.array([-1 - 2 * i, -2 - 2 * i], type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([-1, -2], type=pa.int64()),
            "event_type": pa.array(["click", "purchase"], type=pa.string()),
            "value": pa.array([0.0, 0.0], type=pa.float64()),
            "props": pa.array([None, None], type=pa.string()),
        }
        table = pa.table([cols[f.name] for f in raw_schema.fields],
                         names=[f.name for f in raw_schema.fields])
        tmp = os.path.join(zone, f"_flush_{i}.parquet.tmp")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(zone, f"flush_{i}.parquet"))

    stream = events_stream(spark, zone, schema=raw_schema)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("c_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("p_ts") <= F.col("c_ts")),
        "left_outer",
    ).select(
        "click_id",
        "user_id",
        "purchase_id",
        ts_str("c_ts").alias("click_ts"),
        ts_str("p_ts").alias("purchase_ts"),
        "purchase_value",
    )
    name = f"loj_{uuid.uuid4().hex[:12]}"
    # State partitioning is pinned into the checkpoint at start();
    # scope it down for the drive (see docstring), restore after.
    # r16 (VERDICT r15 task 4): 4 partitions, not the catalog-wide 8 —
    # this is the #2 streaming cost row (6 epochs x 2-sided state
    # commit across 3 builds), and 4 measured better here in both r9
    # and the r16 interleaved A/B; protocol uniformity loses to the
    # top cost row. Results are partitioning-invariant as ever.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    try:
        q.processAllAvailable()  # batch 0: the fixture
        land_flush(0, "2024-06-01 00:00:00")
        q.processAllAvailable()  # applies batch-0 watermark, advances it
        land_flush(1, "2024-06-02 00:00:00")
        q.processAllAvailable()  # releases every remaining real click
    finally:
        q.stop()
    # Sentinels out HERE, on the batch result (see docstring). Detach
    # from the memory sink (the run_stream_to_memory r12 rule): an
    # eager localCheckpoint copies the result to GC-managed blocks so
    # the named sink buffer doesn't outlive the query in a long drive
    # sequence.
    # try/finally so a failed drive still releases the sink buffer.
    try:
        out = spark.table(name).filter(F.col("user_id") >= 0).localCheckpoint()
    finally:
        spark.catalog.dropTempView(name)
    return out


from currency_etl_pipeline_spark.queries.incremental_queries import (  # noqa: E402
    _CDC_ORACLE,
)


@query(
    "streaming_cdc_rollup",
    # Same oracle as the batch twin (single source of truth): the
    # maintained rollup must land on the from-scratch rollup of v2 no
    # matter how the CDC history was chunked into micro-batches.
    oracle=_CDC_ORACLE,
)
def streaming_cdc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of ``cdc_delta_apply_rollup`` — the retraction
    case no built-in streaming aggregation can express: the same
    v1→v2 CDC scenario (inserts, updates with group migration,
    modulo-purge deletes) arrives as a FILE-TAILED change feed in
    multiple micro-batches (batch 0 = v1 as pure inserts, then the
    v1→v2 diff split into chunks), consumed by
    ``streaming/pipeline.stream_cdc_rollup``: foreachBatch applies
    each batch's signed contributions to the committed SnapshotStore
    rollup, epoch-tagged so replays are no-ops. The final committed
    version must hash-match the SAME DuckDB oracle as the batch twin —
    chunking the history must not change a single bit.

    Chunk-order safety: each key appears once per diff, and a group
    emptied by one chunk has exactly-zero partials (DECIMAL), so the
    n>0 drop loses nothing regardless of which chunk lands first.

    Scale: per micro-batch the work is |batch changes| + |rollup|
    rows; the snapshot the feed describes is never read.

    (r16: land_chunked_feed now refuses out-of-range __chunk rows
    instead of silently dropping them; landed bytes unchanged —
    parity-test pinned. This note re-tiers the query into the driver
    sweep, since helper edits don't change its source hash.)
    """
    import tempfile

    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.operators.upsert import snapshot_diff
    from currency_etl_pipeline_spark.queries.incremental_queries import _snapshots
    from currency_etl_pipeline_spark.sources.warehouse import SnapshotStore
    from currency_etl_pipeline_spark.streaming.pipeline import (
        land_chunked_feed,
        stream_cdc_rollup,
    )

    v1, v2 = _snapshots(spark, sf_dir)
    feed = tempfile.mkdtemp(prefix="cdc_feed_")
    # One partitioned write lands all three chunks (r15: was one Spark
    # write job per chunk, each re-deriving the snapshots —
    # streaming/pipeline.land_chunked_feed). pmod, not abs(hash)%2:
    # abs(Integer.MIN_VALUE) stays negative, silently dropping that
    # row from every chunk.
    feed_df = snapshot_diff(v1.limit(0), v1, ["user_id"]).withColumn(
        "__chunk", F.lit(0)
    ).unionByName(
        snapshot_diff(v1, v2, ["user_id"]).withColumn(
            "__chunk", F.pmod(F.hash("user_id"), F.lit(2)) + 1
        )
    )
    land_chunked_feed(feed_df, 3, feed)
    stream = (
        spark.readStream.schema(feed_df.drop("__chunk").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    snap = tempfile.mkdtemp(prefix="cdc_snap_")
    q = stream_cdc_rollup(spark, stream, snap, ["event_type"], "value")
    q.awaitTermination()
    out = SnapshotStore(spark, snap).read()
    return out.select(
        "event_type",
        "n",
        F.round(F.col("sum_x").cast("double"), 4).alias("sum_value"),
        F.round(F.col("sum_x2").cast("double"), 4).alias("sum_sq"),
        F.round((F.col("sum_x").cast("double") / F.col("n")), 6).alias("avg_value"),
    )



# --- streaming MinHash admission gate twin ---------------------------------

# Corpus = doc_id < 400 (the index build, matching text._IDX_SPLIT);
# streamed tail splits into micro-batches at 450. Threshold 0.5 keeps
# est_jaccard comparisons engine-exact (eighths).
_MINGEST_SPLIT = 400
_MINGEST_B2 = 450
_MINGEST_EST = 0.5

from currency_etl_pipeline_spark.queries.text import (  # noqa: E402
    _SHINGLES_DUCK,
    _TOKS_DUCK,
)


@query(
    "streaming_minhash_ingest",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM toks),
    hashed AS (
      SELECT doc_id, s.i AS pos,
             ('0x' || substr(md5(shingle || '#' || CAST(s.i AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) s
    ),
    sig AS (SELECT doc_id, pos, min(h) AS mh FROM hashed GROUP BY doc_id, pos),
    sigarr AS (SELECT doc_id, list(mh ORDER BY pos) AS sig FROM sig GROUP BY doc_id),
    bands AS (
      SELECT doc_id, pos // 2 AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY pos) AS band_key
      FROM sig GROUP BY doc_id, pos // 2
    ),
    near AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id <> b.doc_id
    ),
    nearj AS (
      SELECT n.a, n.b FROM near n
      JOIN sigarr sa ON sa.doc_id = n.a
      JOIN sigarr sb ON sb.doc_id = n.b
      WHERE round(len(list_filter(generate_series(1, 8), i -> sa.sig[i] = sb.sig[i]))
                  / 8.0, 6) >= {_MINGEST_EST}
    ),
    rej1 AS (
      SELECT DISTINCT b AS doc_id FROM nearj
      WHERE b >= {_MINGEST_SPLIT} AND b < {_MINGEST_B2}
        AND (a < {_MINGEST_SPLIT} OR (a >= {_MINGEST_SPLIT} AND a < b))
    ),
    acc1 AS (
      SELECT doc_id FROM documents
      WHERE doc_id >= {_MINGEST_SPLIT} AND doc_id < {_MINGEST_B2}
        AND doc_id NOT IN (SELECT doc_id FROM rej1)
    ),
    rej2 AS (
      SELECT DISTINCT b AS doc_id FROM nearj
      WHERE b >= {_MINGEST_B2}
        AND (a < {_MINGEST_SPLIT}
             OR a IN (SELECT doc_id FROM acc1)
             OR (a >= {_MINGEST_B2} AND a < b))
    )
    SELECT d.doc_id,
           d.doc_id NOT IN (SELECT doc_id FROM rej1
                            UNION ALL SELECT doc_id FROM rej2) AS admitted
    FROM documents d WHERE d.doc_id >= {_MINGEST_SPLIT}
    """,
)
def streaming_minhash_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup ADMISSION loop, end-to-end: build the MinHash
    index over the accepted corpus (doc_id < 400), then tail the
    remaining documents as a 2-micro-batch file stream through
    ``streaming/pipeline.stream_minhash_ingest`` — each batch checked
    against the index (band probe + signature compare, est_jaccard ≥
    0.5) and against its own lower-id rows, survivors landed per epoch
    AND appended to the index so batch 2 is gated on corpus ∪
    batch-1-admissions. Returns (doc_id, admitted) for every streamed
    doc; the oracle replays the same sequential admission in SQL
    (rej1/acc1/rej2 CTEs), so the driver hash-checks the whole
    lifecycle: build → query → admit → append → query.

    Scale: per batch, shingling is map-side over the batch only; the
    index joins are bounded equi-joins (batch side broadcast by AQE);
    corpus text is never re-hashed. The streamed feed is tiny here by
    construction — the plan shape, not the volume, is what carries to
    100 TB (same as the other streaming twins). r15 optimization:
    ``stream_minhash_ingest`` now spreads an under-parallel micro-batch
    to defaultParallelism before the hash pass (a 1-file trigger
    otherwise shingles the whole batch on ONE scan task — guide §2.5);
    the 550-doc epoch's decision pass measured 4.2-4.3 s → 1.2-1.5 s
    at sf0.1, whole drive 6.4-7.0 s → 3.6-4.0 s.

    Drive cost (r11 protocol trim, the left-outer-join precedent): the
    two feed files land DRIVER-SIDE with pyarrow (a column-pruned,
    predicate-filtered read of the fixture file — no Spark
    repartition(1) write jobs for a fixture feed), and the admission
    drive runs under 8 shuffle partitions (scoped, restored after —
    every foreachBatch epoch's joins are batch-bounded, so 32-way
    shuffles are pure per-epoch protocol; r16 measured 4 partitions
    FLAT — the per-epoch floor is the landing protocol's job/write
    count, OPTIMIZATION_r16.md). Results are partitioning-invariant
    (pinned catalog-wide). (r16: the per-batch hash tables derive
    bands from the signature array and the spread probe reads the
    persisted batch; this note re-tiers the query into the driver
    sweep — helper edits don't change its source hash.)
    """
    import os
    import tempfile

    import pyarrow.parquet as papq
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.sources.dedup_index import build_minhash_index
    from currency_etl_pipeline_spark.streaming.pipeline import stream_minhash_ingest
    from currency_etl_pipeline_spark.tables import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    feed = tempfile.mkdtemp(prefix="mh_ingest_feed_")
    windows = [(_MINGEST_SPLIT, _MINGEST_B2), (_MINGEST_B2, None)]
    for i, (lo, hi) in enumerate(windows):
        filt = [("doc_id", ">=", lo)] + ([("doc_id", "<", hi)] if hi is not None else [])
        tbl = papq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"], filters=filt
        )
        sub = os.path.join(feed, f"b{i}")
        os.makedirs(sub)
        out = os.path.join(sub, "batch.parquet")
        papq.write_table(tbl, out)
        os.utime(out, (1_000_000_000 + i * 1000,) * 2)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        idx = tempfile.mkdtemp(prefix="mh_ingest_idx_")
        build_minhash_index(
            spark, docs.filter(F.col("doc_id") < _MINGEST_SPLIT), idx,
            num_hashes=8, band_size=2,
        )
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed + "/*")
        )
        acc = tempfile.mkdtemp(prefix="mh_ingest_acc_")
        q = stream_minhash_ingest(spark, stream, idx, acc, _MINGEST_EST)
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    admitted = (
        spark.read.parquet(acc)
        .select("doc_id")
        .withColumn("admitted", F.lit(True))
    )
    return (
        docs.filter(F.col("doc_id") >= _MINGEST_SPLIT)
        .select("doc_id")
        .join(admitted, "doc_id", "left")
        .select("doc_id", F.coalesce("admitted", F.lit(False)).alias("admitted"))
    )


from currency_etl_pipeline_spark.queries.incremental_queries import (  # noqa: E402
    _DISTINCT_ORACLE,
    _DISTINCT_RESKETCH_AT,
)


@query(
    "streaming_cdc_distinct",
    # Same oracle as the batch twin: the maintained distinct counts
    # must land on the from-scratch COUNT(DISTINCT) of v2 no matter
    # how the CDC history was chunked into micro-batches.
    oracle=_DISTINCT_ORACLE,
)
def streaming_cdc_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of ``cdc_distinct_maintenance``: the same v1→v2
    CDC scenario (per-user latest states; inserts, bucket/group-moving
    updates, modulo-purge deletes) arrives as a file-tailed change feed
    in 3 micro-batches (v1 as pure inserts, then the v1→v2 diff split
    in two), consumed by ``streaming/pipeline.stream_cdc_distinct``:
    each batch's signed witness deltas land on the committed SUPPORT
    multiset, epoch-tagged so replays are no-ops. The final version's
    ``distinct_count_report`` must hash-match the SAME DuckDB oracle
    as the batch twin — chunking must not change a single count.

    Scale: per micro-batch the work is |batch changes| + |support|
    rows; the snapshot the feed describes is never read.
    (r16: land_chunked_feed now refuses out-of-range __chunk rows
    instead of silently dropping them; landed bytes unchanged —
    parity-test pinned. This note re-tiers the query into the driver
    sweep, since helper edits don't change its source hash.)
    """
    import tempfile

    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.operators.incremental import (
        distinct_count_report,
    )
    from currency_etl_pipeline_spark.operators.upsert import snapshot_diff
    from currency_etl_pipeline_spark.queries.incremental_queries import _snapshots
    from currency_etl_pipeline_spark.sources.warehouse import SnapshotStore
    from currency_etl_pipeline_spark.streaming.pipeline import (
        land_chunked_feed,
        stream_cdc_distinct,
    )

    v1, v2 = _snapshots(spark, sf_dir)
    bucket = F.floor("value").cast("long").alias("value_bucket")
    v1b = v1.select("user_id", "event_type", bucket)
    v2b = v2.select("user_id", "event_type", bucket)
    feed = tempfile.mkdtemp(prefix="cdc_dist_feed_")
    # One partitioned write lands all three chunks (r15: was one Spark
    # write job per chunk, each re-deriving the snapshots —
    # streaming/pipeline.land_chunked_feed). pmod, not abs(hash)%2:
    # abs(Integer.MIN_VALUE) stays negative, silently dropping that
    # row from every chunk.
    feed_df = snapshot_diff(v1b.limit(0), v1b, ["user_id"]).withColumn(
        "__chunk", F.lit(0)
    ).unionByName(
        snapshot_diff(v1b, v2b, ["user_id"]).withColumn(
            "__chunk", F.pmod(F.hash("user_id"), F.lit(2)) + 1
        )
    )
    land_chunked_feed(feed_df, 3, feed)
    stream = (
        spark.readStream.schema(feed_df.drop("__chunk").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    snap = tempfile.mkdtemp(prefix="cdc_dist_snap_")
    q = stream_cdc_distinct(
        spark, stream, snap, ["event_type"], "value_bucket"
    )
    q.awaitTermination()
    support = SnapshotStore(spark, snap).read()
    return distinct_count_report(
        support, ["event_type"], resketch_threshold=_DISTINCT_RESKETCH_AT
    )


from currency_etl_pipeline_spark.queries.registry import _REGISTRY  # noqa: E402


@query(
    "streaming_token_drift",
    # Same oracle as the batch twin (single source of truth): the
    # maintained count store must land on the from-scratch chi-square
    # report no matter how the second half was chunked into batches.
    oracle=_REGISTRY["token_drift_report"].oracle,
)
def streaming_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of ``token_drift_report``: the reference half of
    the corpus (doc_id ≤ midpoint) is profiled once in batch; the
    SECOND half arrives as a file-tailed document stream in three
    micro-batches, ``streaming/pipeline.stream_token_counts``
    maintains its per-token counts in an epoch-tagged SnapshotStore
    (additive merge — integer sums commute, so ANY chunking lands on
    identical counts; the tag makes at-least-once delivery
    exactly-once), and the final report scores the reference counts
    against the maintained store through the SAME
    ``drift_report_from_counts`` scorer the batch query uses. The
    result must hash-match the batch oracle — this is the per-batch
    drift monitor an ingestion pipeline actually runs (the reference
    vocabulary is fixed; each arriving batch updates the comparison
    side), graded end to end.

    Zero-fill semantics: tokens seen in only one half enter the
    full-outer count join with an explicit 0 on the other side —
    exactly the rows the batch query's single-pass conditional sums
    produce.

    Scale: per micro-batch the store shuffle is vocabulary-sized
    (Heaps' law), never corpus-sized; the midpoint is ONE 1-row
    collect (the bounded params-collect convention).
    (r16: land_chunked_feed now refuses out-of-range __chunk rows
    instead of silently dropping them; landed bytes unchanged —
    parity-test pinned. This note re-tiers the query into the driver
    sweep, since helper edits don't change its source hash.)
    """
    import tempfile

    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.queries.text import (
        drift_report_from_counts,
        tokens,
    )
    from currency_etl_pipeline_spark.sources.warehouse import SnapshotStore
    from currency_etl_pipeline_spark.streaming.pipeline import (
        land_chunked_feed,
        stream_token_counts,
    )
    from currency_etl_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    m = docs.agg(F.expr("(min(doc_id) + max(doc_id)) DIV 2").alias("m")).collect()[0][
        "m"
    ]
    ref = (
        docs.filter(F.col("doc_id") <= m)
        .select(F.explode(tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
    )
    second = docs.filter(F.col("doc_id") > m).select("doc_id", "text")
    feed = tempfile.mkdtemp(prefix="drift_feed_")
    # One partitioned write lands all three chunks (r15: was one Spark
    # write job per chunk, each re-scanning the corpus —
    # streaming/pipeline.land_chunked_feed; 0.65 s → 0.29 s min-of-4
    # at sf0.1, chunk contents byte-identical). pmod maps every hash
    # value (incl. Integer.MIN_VALUE, where abs() stays negative) into
    # {0,1,2} so no doc can drop from all three micro-batches
    # (ADVICE r9).
    land_chunked_feed(
        second.withColumn("__chunk", F.pmod(F.hash("doc_id"), F.lit(3))),
        3,
        feed,
        prefix="b",
    )
    stream = (
        spark.readStream.schema(second.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    snap = tempfile.mkdtemp(prefix="drift_store_")
    q = stream_token_counts(spark, stream, snap)
    q.awaitTermination()
    got = SnapshotStore(spark, snap).read()
    c = (
        ref.join(got, "tok", "full_outer")
        .select(
            "tok",
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("a"),
            F.coalesce(F.col("b"), F.lit(0)).cast("long").alias("b"),
        )
    )
    return drift_report_from_counts(c)
