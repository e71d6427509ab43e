"""Grouped-map pandas transforms (applyInPandas) — the §2.J surface.

The reference's per-pair logic is pandas-in-a-task (fetch.py,
transform.py); the distributed generalization is applyInPandas: the
engine shuffles each group to one executor and hands it over as a
pandas DataFrame via Arrow. Use it ONLY when the per-group logic truly
needs imperative pandas (here: order-statistics over per-group
sequences); everything expressible as built-ins stays JVM-side.

Oracle-parity: the gap statistics are computed over integer
microsecond deltas — order statistics on exact integers, so pandas and
DuckDB agree bit-for-bit (no float accumulation anywhere).
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.tables import load_table

GAP_SCHEMA = (
    "user_id long, n_events long, n_gaps long, median_gap_us double, max_gap_us double"
)


def _gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    # Numpy throughout: this function runs once PER GROUP, and with
    # millions of small groups the pandas idioms (sort_values, a
    # DataFrame built from a list of dicts) cost milliseconds each —
    # they dominated the whole query's wall clock (~4x) before this
    # rewrite. lexsort + diff on raw int64 arrays is microseconds.
    import numpy as np

    # exact integer microseconds; normalize the unit explicitly —
    # pandas may hold datetime64[ns] or [us] depending on the Arrow path.
    ts = pdf["ts"].astype("datetime64[us]").to_numpy().astype("int64")
    order = np.lexsort((pdf["event_id"].to_numpy(), ts))
    gaps = np.diff(ts[order])
    if len(gaps) == 0:
        med = mx = None
    else:
        # Keep exact: integer micros, or an n.5 midpoint for even-count
        # medians — both exactly representable in float64. No division,
        # no rounding, so no cross-engine tie-breaking to disagree on.
        med = float(np.median(gaps))
        mx = float(gaps.max())
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [len(pdf)],
            "n_gaps": [len(gaps)],
            "median_gap_us": [med],
            "max_gap_us": [mx],
        }
    )


@query(
    "user_gap_stats",
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT user_id,
           count(*) AS n_events,
           count(gap_us) AS n_gaps,
           CAST(median(gap_us) AS DOUBLE) AS median_gap_us,
           CAST(max(gap_us) AS DOUBLE) AS max_gap_us
    FROM g GROUP BY user_id
    """,
)
def user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event-gap order statistics (median/max gap in
    exact microseconds) via grouped-map ``applyInPandas`` — each user's event
    sequence arrives as one Arrow-backed pandas frame, processed with
    numpy (lexsort/diff/median) because the per-group call runs once
    PER KEY and pandas idioms cost milliseconds each at millions of
    tiny groups (r6: the body went from ~2.7s to ~1s over the ~2.6
    ms/group applyInPandas framework floor at sf0.1).

    Plan: ONE shuffle on user_id, then per-group vectorized numpy.
    State is bounded by the largest single group — at 100 TB a hot user
    is the risk, which is why everything that doesn't need sequence
    order (the agg families) stays JVM-side; this operator exists for
    logic that genuinely wants an ordered per-key array in Python.

    Partitioning (r15 optimization): the shuffle is an EXPLICIT
    ``repartition(defaultParallelism, user_id)`` — same single
    exchange (groupBy reuses the key partitioning), but AQE cannot
    coalesce a user-specified partition count. Left to
    ENSURE_REQUIREMENTS, AQE's byte-based coalescing folded this
    ~2 MB shuffle into ONE partition, which serialized every per-group
    Python call into a single worker — byte heuristics are blind to
    downstream per-GROUP cost at the Python boundary. Measured at
    sf0.1 (1 500 groups): 4.69 s → 0.80 s min-of-4, identical rows.
    At 100 TB the same expression scales with the cluster instead of
    with AQE's advisory bytes.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    par = spark.sparkContext.defaultParallelism
    return (
        ev.repartition(par, "user_id")
        .groupBy("user_id")
        .applyInPandas(_gap_stats, GAP_SCHEMA)
    )


@query(
    "scalar_pandas_udf_tokens",
    oracle="""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           length(trim(text)) AS n_trim_chars
    FROM documents
    """,
)
def scalar_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.J's scalar ``pandas_udf`` surface: Arrow-batched
    series→series token/char counting over the documents table —
    pandas string ops on whole columnar batches, zero per-row Python
    calls. Exact integer outputs keep the oracle bit-exact.

    This is deliberately the SLOW-PATH twin of ``token_stats``'s
    codegen form (the catalog's hot paths stay JVM-side, SURVEY §4);
    it exists to pin the full UDF surface: scalar pandas_udf here,
    mapInPandas (multimodal/media.py), applyInPandas (user_gap_stats
    below), applyInPandasWithState (streaming/stateful.py). At scale a
    scalar pandas_udf costs one Arrow serialization round-trip per
    batch — acceptable for logic the JVM cannot express, waste for
    logic it can.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # Nullable Int64, NOT int64: .str.len() yields NaN for NULL text
    # and a plain int64 cast raises on the first null row, where the
    # SQL semantics (and the UDTF twin's explicit None branch) return
    # NULL. Fixture docs happen to be all non-null — nullable dtype
    # keeps the UDF correct on a real corpus.
    @pandas_udf("long")
    def n_tokens(s: pd.Series) -> pd.Series:
        return s.str.strip(" ").str.split(r"\s+", regex=True).str.len().astype("Int64")

    @pandas_udf("long")
    def n_trim_chars(s: pd.Series) -> pd.Series:
        return s.str.strip(" ").str.len().astype("Int64")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_tokens("text").alias("n_tokens"),
        n_trim_chars("text").alias("n_trim_chars"),
    )


@query(
    "udtf_token_positions",
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents WHERE doc_id < 40
    ), idx AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t
    )
    SELECT doc_id, i - 1 AS pos, toks[i] AS token FROM idx
    """,
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.J's UDTF surface: a Python table function (one input
    row → many output rows) applied via LATERAL join — the
    user-defined generator form of ``token_positions``'s posexplode.

    Deliberately bounded to a 40-doc slice: a Python UDTF runs
    eval() per input ROW (no Arrow batching in the emit path), so it
    is the slowest surface in the engine — the docstring twin
    `token_positions` does the same job in codegen and is the form
    every hot path uses. This query exists to pin that the engine
    EXPOSES the surface, with the measured caveat, not to recommend
    it.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str):
            # Mirror the engine's trim+split exactly: SQL trim strips
            # SPACES only and regex \s+ split keeps a boundary empty
            # token — Python's bare strip()/split() does neither
            # (SKILL.md gotcha). NULL text yields no rows.
            if text is None:
                return
            import re

            for i, tok in enumerate(re.split(r"\s+", text.strip(" "))):
                yield i, tok

    spark.udtf.register("split_tokens", SplitTokens)
    load_table(spark, sf_dir, "documents").filter("doc_id < 40").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.token "
        "FROM _udtf_docs d, LATERAL split_tokens(d.text) s"
    )


@query(
    "pandas_udaf_median_value",
    oracle="""
    SELECT event_type, median("value") AS median_value, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def pandas_udaf_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.J's UDAF surface: a GROUPED_AGG ``pandas_udf`` —
    a custom aggregate the engine treats like any built-in (usable in
    groupBy.agg alongside count). Median is the canonical justified
    case: a true order statistic, NOT expressible as a mergeable
    partial aggregate, so Spark shuffles each group's values to one
    executor and hands them to pandas whole.

    Parity: the even-count median averages two doubles — one IEEE
    operation, bit-identical across engines; no accumulation-order
    dependence because there is no accumulation. At 100 TB you reach
    for the mergeable sketch twin instead (`lineitem_percentiles_
    approx`, t-digest-style); this surface is for exact small-group
    aggregates and the occasional custom statistic.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM
    # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the
    # row count is a second pandas aggregate.
    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return int(len(v))

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        median_udaf("value").alias("median_value"),
        count_udaf("value").alias("n"),
    )


SHARD_STREAM_SCHEMA = (
    "lang string, shard_id long, n_docs long, total_tokens long, "
    "first_doc long, last_doc long, stream_md5 string"
)


def _shard_stream(pdf: pd.DataFrame) -> pd.DataFrame:
    import hashlib
    import re

    pdf = pdf.sort_values("doc_id")
    toks: list[str] = []
    for text in pdf["text"]:
        # mirror the engine's tokenizer exactly: trim SPACES only,
        # split on \s+ (the _TOKS_DUCK twin) — same list both engines.
        toks.extend(re.split(r"\s+", text.strip(" ")))
    stream = " ".join(toks)
    return pd.DataFrame(
        [
            {
                "lang": pdf["lang"].iloc[0],
                "shard_id": int(pdf["shard_id"].iloc[0]),
                "n_docs": len(pdf),
                "total_tokens": len(toks),
                "first_doc": int(pdf["doc_id"].min()),
                "last_doc": int(pdf["doc_id"].max()),
                "stream_md5": hashlib.md5(stream.encode()).hexdigest(),
            }
        ]
    )


def _shard_stream_oracle() -> str:
    from currency_etl_pipeline_spark.queries.llm_prep import PACK_BUDGET

    toks = "regexp_split_to_array(trim(text), '\\s+')"
    return f"""
    WITH t AS (
        SELECT doc_id, lang, text, {toks} AS toks,
               len({toks}) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, lang, toks, n_tokens,
               CAST(floor(CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) / {PACK_BUDGET}.0) AS BIGINT) AS shard_id
        FROM t
    )
    SELECT lang, shard_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           md5(array_to_string(flatten(list(toks ORDER BY doc_id)), ' ')) AS stream_md5
    FROM c GROUP BY lang, shard_id
    """


@query("shard_token_streams", oracle=_shard_stream_oracle())
def shard_token_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataloader-facing end of the packing pipeline: for every
    (lang, shard) from ``sequence_packing``'s assignment, the ORDERED
    concatenated token stream each training sequence would be built
    from — materialized as an md5 of the exact stream (content-pinned
    without shipping megabytes through the comparison) plus doc/token
    bookkeeping.

    This is the ordered grouped-map shape (§2.J): each shard's docs
    shuffle to one executor, arrive as a pandas frame, are sorted by
    doc_id and concatenated — logic that genuinely needs an ordered
    per-group sequence, which is exactly when applyInPandas is the
    right tool (a collect_list(ORDER BY) + flatten could express the
    concat, but the real op this stands in for — tokenize-and-write
    one shard file per group — needs imperative per-group code). The
    oracle replays it relationally with DuckDB's ordered list
    aggregation, so the driver hash-checks the full assignment AND the
    byte-exact stream content.

    Scale: groups are token-budget-bounded by construction (~512
    tokens), so per-group pandas state is tiny regardless of corpus
    size; the only shuffle is the groupBy on (lang, shard_id) — made
    an EXPLICIT ``repartition(defaultParallelism, keys)`` in r15: AQE's
    byte-based coalescing folded the tiny exchange into one partition
    and serialized all 530 per-group Python calls into a single worker
    (the user_gap_stats mechanism, same fix); measured 2.34 s → 1.23 s
    min-of-4 at sf0.1, identical rows.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.queries.llm_prep import packed_docs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    assigned = docs.join(
        packed_docs(docs).select("doc_id", "lang", "shard_id"), ["doc_id", "lang"]
    )
    par = spark.sparkContext.defaultParallelism
    return (
        assigned.repartition(par, "lang", "shard_id")
        .groupBy("lang", "shard_id")
        .applyInPandas(_shard_stream, SHARD_STREAM_SCHEMA)
    )


@query(
    "udtf_user_activity_profile",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rt
        FROM events
    ), agg AS (
        SELECT user_id, count(*) AS n_events,
               min_by(event_type, rn) AS first_type,
               max_by(event_type, rn) AS last_type
        FROM o GROUP BY user_id
    ), runs AS (
        SELECT user_id, count(*) AS run_len
        FROM o GROUP BY user_id, event_type, rn - rt
    ), mx AS (
        SELECT user_id, CAST(max(run_len) AS INT) AS max_run FROM runs GROUP BY user_id
    )
    SELECT a.user_id, a.n_events, a.first_type, a.last_type, m.max_run
    FROM agg a JOIN mx m USING (user_id)
    """,
)
def udtf_user_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.J's TABLE-ARGUMENT UDTF surface (Spark 4's
    ``my_udtf(TABLE(t) PARTITION BY k ORDER BY ...)``): each user's
    ordered event sequence arrives at ONE Python class instance via
    eval() calls, terminate() emits the per-user profile — n_events,
    first/last event type, and the longest consecutive same-type run
    (genuinely sequential logic).

    Like ``udtf_token_positions``, this exists to PIN the surface, not
    to recommend it: rows cross into Python one at a time (no Arrow
    batching), so the identical computation's hot path is the
    gaps-and-islands window form — which is exactly what the DuckDB
    oracle runs, making this a cross-paradigm check (imperative
    per-partition Python vs relational windows). The PARTITION BY
    shuffle is the same single exchange applyInPandas would pay;
    per-user state is bounded by the heaviest key.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, first_type string, last_type string, max_run int")
    class Profile:
        def __init__(self):
            self.rows = []

        def eval(self, row):
            self.rows.append((row["ts"], row["event_id"], row["user_id"], row["event_type"]))

        def terminate(self):
            if not self.rows:
                return
            rows = sorted(self.rows)  # defensive; ORDER BY already sorts
            max_run = run = 1
            for i in range(1, len(rows)):
                run = run + 1 if rows[i][3] == rows[i - 1][3] else 1
                max_run = max(max_run, run)
            yield rows[0][2], len(rows), rows[0][3], rows[-1][3], max_run

    spark.udtf.register("user_activity_profile", Profile)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_udtf_src")
    return spark.sql(
        "SELECT * FROM user_activity_profile(TABLE(events_udtf_src) "
        "PARTITION BY user_id ORDER BY (ts, event_id))"
    )
