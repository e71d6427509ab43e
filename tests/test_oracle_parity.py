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


# Aggregation-heavy queries whose values would drift under double
# partial sums: the exact-DECIMAL / two-level-prefix-sum discipline
# claims their results are IDENTICAL at any partition count — the
# property that makes a 1000-executor run reproduce a 32-thread run.
_PARTITION_SENSITIVE = [
    "tpch_q1_pricing_summary",
    "lineitem_corr_moments",
    "events_anomaly_zscore",
    "sequence_packing",
    "domain_temperature_resample",
    "monthly_revenue_momentum",
    # r5: fixed-point BIGINT log-prob sums / digest-min winners claim
    # the same partition-count independence.
    "perplexity_quality_score",
    "passage_dedup_rewrite",
    # r8: integer-only end to end — exact-partial assignment ranking
    # AND BIGINT micro-unit drift output claim the same invariance.
    "ivf_centroid_drift_report",
    # r9 batch 3: each docstring claims order-independent integer
    # arithmetic (floor-div PPS thresholds; floor-div PageRank power
    # iteration; ±1 sweep with whole-peer-group RANGE frames).
    "pps_systematic_sample",
    "near_dup_pagerank",
    "peak_concurrent_sessions",
    # r10: the per-cell numpy Gram kernel claims the same invariance —
    # groupBy collapses each cell into ONE pandas group whatever the
    # input partitioning, and the all-integer duplicate test has no
    # accumulation order at all.
    "semdedup_cell_prune",
]


def test_drift_report_surface_is_integer_only(spark, sf_dir):
    """r8 hardening for the twice-hash-red drift report: after the
    assignment ranking moved to exact scale-9 integer partials
    (`_ranked_cells_exact`), NO floating-point column may remain in
    the output — drift is BIGINT micro-units, recluster an integer
    compare. A float type reappearing here would silently reopen the
    engine-variant surface the r7/r8 fixes closed."""
    df = SPECS["ivf_centroid_drift_report"].spark(spark, sf_dir)
    kinds = {f.name: f.dataType.typeName() for f in df.schema.fields}
    assert kinds == {
        "cid": "long",
        "n": "long",
        "n_new": "long",
        "drift_e6": "long",
        "recluster": "boolean",
    }


@pytest.mark.parametrize("name", _PARTITION_SENSITIVE)
def test_results_identical_across_partition_counts(spark, sf_dir, name):
    spec = SPECS[name]

    def run():
        return sorted(map(tuple, spec.spark(spark, sf_dir).collect()))

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        few = run()
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        many = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert few == many, f"{name} result depends on partition count"


# The join-heaviest catalog queries: at test scale AQE broadcasts most
# of their sides; at 100 TB those sides outgrow the threshold and every
# join becomes shuffle/sort-merge. Forcing threshold = -1 runs THAT
# regime here — answers must be identical, or a query is silently
# depending on broadcast semantics (e.g. build-side null handling,
# join-order effects) that won't hold at scale.
_JOIN_HEAVY = [
    "revenue_by_region",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_nation_trade_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume_customers",
    "tpch_q21_waiting_suppliers",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q20_promotion_suppliers",
    "purchases_within_1h_before_click",
    "customer_order_stats",
    # r9: the inverted-index containment join and the day-bucketed
    # interval self-join must survive the sort-merge regime too.
    "doc_containment_pairs",
    "concurrent_session_pairs",
]


@pytest.mark.parametrize("name", _JOIN_HEAVY)
def test_join_heavy_queries_correct_without_broadcast(spark, sf_dir, duck, name):
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spec = SPECS[name]
        compare(spec.spark(spark, sf_dir), duck, spec.oracle)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


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


def _write_docs(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else 0 for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


def test_shard_prep_collapses_pii_differing_duplicates(spark, tmp_path):
    """Two gated docs identical up to their PII must land in ONE dedup
    group in BOTH engines (the redacted-hash semantics the docstring
    promises). Regression: the oracle used to also GROUP BY raw text,
    keeping PII-variants apart while Spark merged them — latent on the
    PII-free fixture."""
    import duckdb

    base = "the fast data table join merge sort " * 8  # passes the gate
    _write_docs(
        tmp_path,
        [
            # DIFFERENT-length PII (the common case): n_chars and raw
            # token counts differ between the twins, so this also pins
            # that neither is part of the dedup key and that the
            # surviving counts are the keeper's own (min_by), not an
            # arbitrary member's.
            (1, base + "call +1 555-0101 now", "en", "s"),
            (2, base + "call +44 20 7946 0958 123 now", "en", "s"),
            (3, base + "a different tail entirely", "en", "s"),
        ],
    )
    spec = SPECS["training_shard_prep"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    compare(df, con, spec.oracle)
    row = df.collect()[0]
    # 3 docs ×2 (doubled corpus) → PII-twins 1&2 collapse with their
    # copies into ONE group; doc 3 + copy into another → n_docs == 2.
    assert row["n_docs"] == 2, f"PII-differing duplicates did not collapse: {row}"


def test_doc_repetition_null_text_matches_oracle(spark, tmp_path):
    """NULL-text docs must be ABSENT from doc_repetition_score in both
    engines (the oracle's unnest yields no rows for them). Regression:
    the map-only rewrite emitted a garbage row for them until the
    explicit notnull filter."""
    import duckdb

    _write_docs(
        tmp_path,
        [(0, "a a b", "en", "s"), (1, None, "en", "s"), (2, "x y z z", "en", "s")],
    )
    spec = SPECS["doc_repetition_score"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    compare(df, con, spec.oracle)
    ids = {r["doc_id"] for r in df.collect()}
    assert ids == {0, 2}, "null-text doc must drop out, not crash or emit a row"


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


def test_redact_pii_semantics_and_engine_parity(spark):
    """The redaction chain must mask real PII correctly AND produce
    byte-identical output in Spark and DuckDB (the fixture corpus has
    no organic PII, so this is where the value semantics are pinned).
    Counts follow the staged rule: emails on raw, phones on
    email-redacted, ids on phone-redacted — disjoint."""
    import duckdb
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.functions.redact import (
        pii_counts,
        pii_counts_duck,
        redact_pii,
        redact_pii_duck,
    )

    cases = [
        ("mail john.doe+spam@corp.example.org today", "mail [EMAIL] today", (1, 0, 0)),
        ("call +44 20-7946 0958 or +1 555-0100 now", "call [PHONE] or [PHONE] now", (0, 2, 0)),
        ("order 123456789 shipped, ref 55555", "order [ID] shipped, ref 55555", (0, 0, 1)),
        ("id 12345 stays (five digits)", "id 12345 stays (five digits)", (0, 0, 0)),
        ("x@y.io then 9876543 then +1 2345678", "[EMAIL] then [ID] then [PHONE]", (1, 1, 1)),
        ("no pii at all", "no pii at all", (0, 0, 0)),
    ]
    df = spark.createDataFrame([(t,) for t, _, _ in cases], "text string")
    ne, np_, ni = pii_counts(F.col("text"))
    got = df.select(
        "text", redact_pii(F.col("text")).alias("red"),
        ne.alias("ne"), np_.alias("np"), ni.alias("ni"),
    ).collect()
    by_text = {r["text"]: r for r in got}
    con = duckdb.connect()
    dne, dnp, dni = pii_counts_duck("t")
    for text, want_red, (we, wp, wi) in cases:
        r = by_text[text]
        assert r["red"] == want_red, f"spark redaction wrong for {text!r}: {r['red']!r}"
        assert (r["ne"], r["np"], r["ni"]) == (we, wp, wi), f"counts wrong for {text!r}"
        duck = con.execute(
            f"SELECT {redact_pii_duck('t')}, {dne}, {dnp}, {dni} FROM (SELECT ? AS t)",
            [text],
        ).fetchone()
        assert duck[0] == want_red, f"duckdb redaction diverges for {text!r}: {duck[0]!r}"
        assert tuple(duck[1:]) == (we, wp, wi)


def test_redact_pii_documents_nonvacuous(spark, sf_dir):
    """The grafted catalog query must actually redact: roughly 3/7 of
    documents carry synthetic PII and every grafted doc reports
    exactly one hit of its kind."""
    rows = SPECS["redact_pii_documents"].spark(spark, sf_dir).collect()
    hits = [r for r in rows if (r["n_emails"] + r["n_phones"] + r["n_ids"]) > 0]
    assert len(hits) > 0.3 * len(rows), "graft did not take — redaction vacuous"
    for r in rows:
        mod = r["doc_id"] % 7
        want = {0: (1, 0, 0), 1: (0, 1, 0), 2: (0, 0, 1)}.get(mod, (0, 0, 0))
        assert (r["n_emails"], r["n_phones"], r["n_ids"]) == want, f"doc {r['doc_id']}"
        assert ("[EMAIL]" in r["redacted"]) == (mod == 0)
        assert ("[PHONE]" in r["redacted"]) == (mod == 1)
        assert ("[ID]" in r["redacted"]) == (mod == 2)


def test_validation_checks_actually_bite(spark):
    """The catalog's data_quality_report is all-zeros on the healthy
    fixture, so this pins that every check class genuinely counts
    violations when they exist: range breaks, NULL conditions (an
    unevaluable expectation is a violation), duplicate keys, orphaned
    and NULL foreign keys."""
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.operators.validate import (
        fk_check,
        quality_report,
        row_checks,
        unique_check,
    )

    child = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, None), (3, 7.0), (None, 1.0)],
        "k int, v double",
    )
    parent = spark.createDataFrame([(1,), (2,)], "k int")
    rows = row_checks(
        child,
        {
            "v_positive": F.col("v") > 0,  # -5 fails; NULL v counts too
            "k_not_null": F.col("k").isNotNull(),
        },
    )
    report = {
        r["check"]: r["n_violations"]
        for r in quality_report(
            [
                rows,
                unique_check(child, ["k"]),
                fk_check(child, ["k"], parent, ["k"]),
            ]
        ).collect()
    }
    assert report["v_positive"] == 2, "range + NULL-condition rows must both count"
    assert report["k_not_null"] == 1
    assert report["unique(k)"] == 2, "5 rows, 3 distinct non-null + NULL bucket"
    assert report["fk(k)"] == 2, "k=3 orphan and NULL key are both broken refs"


def test_gap_fill_produces_real_gaps_and_ffills(spark, sf_dir):
    """The sparse slice must yield genuine empty hours (else the
    query proves nothing) and every gap row must carry a forward-
    filled value — the grid starts at each type's first active hour,
    so no gap can precede all data."""
    rows = SPECS["hourly_gap_fill_forward"].spark(spark, sf_dir).collect()
    gaps = [r for r in rows if r["n_events"] == 0]
    assert gaps, "no empty hours — gap-fill is vacuous on this fixture"
    assert all(r["sum_value"] is None for r in gaps)
    assert all(r["ffill_sum_value"] is not None for r in gaps), "gap without forward fill"
    filled = [r for r in rows if r["n_events"] > 0]
    assert all(r["ffill_sum_value"] == r["sum_value"] for r in filled)


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


def test_chunk_windows_edge_docs_match_oracle(spark, tmp_path):
    """Chunking edge cases the fixture never hits: a doc shorter than
    one window, exactly one window, one-past-a-stride boundary, and a
    multi-stride doc. Engines must agree AND the chunks must tile the
    doc: starts advance by the stride, every token lands in >= 1 chunk,
    and consecutive chunks overlap by width - stride tokens."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from currency_etl_pipeline_spark.queries.llm_prep import (
        _CHUNK_STRIDE,
        _CHUNK_WIDTH,
    )

    texts = {
        0: " ".join(f"t{i}" for i in range(3)),                 # < width
        1: " ".join(f"t{i}" for i in range(_CHUNK_WIDTH)),      # == width
        2: " ".join(f"t{i}" for i in range(_CHUNK_STRIDE + 1)), # one past stride
        3: " ".join(f"t{i}" for i in range(3 * _CHUNK_STRIDE + 5)),
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts.values()], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    spec = SPECS["doc_chunk_windows"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    compare(df, con, spec.oracle)
    by_doc: dict = {}
    for r in df.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in texts.items():
        n = len(text.split())
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        assert chunks[0]["start_tok"] == 0
        covered = set()
        for c in chunks:
            assert 1 <= c["n_tokens"] <= _CHUNK_WIDTH
            assert c["chunk_text"].split() == text.split()[c["start_tok"] : c["start_tok"] + c["n_tokens"]]
            covered |= set(range(c["start_tok"], c["start_tok"] + c["n_tokens"]))
        assert covered == set(range(n)), f"doc {doc_id}: chunks do not tile the doc"
        starts = [c["start_tok"] for c in chunks]
        assert starts == [i * _CHUNK_STRIDE for i in range(len(chunks))]


def test_passage_dedup_rewrite_is_idempotent(spark, tmp_path, sf_dir):
    """A second pass over the rewritten corpus must be a no-op
    (n_kept == n_passages for every doc). Note re-chunking shifts
    window boundaries where passages were dropped, so this holds
    because the rewritten corpus contains no duplicated 16-word chunk
    at the NEW boundaries either — the fixed-point property a pipeline
    relies on when it re-runs dedup over already-cleaned shards. A
    regression that drops first occurrences (or re-introduces dups in
    reassembly) breaks the fixed point and fails here."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from currency_etl_pipeline_spark.tables import load_table

    first = SPECS["passage_dedup_rewrite"].spark(spark, sf_dir).collect()
    rewritten = [(r["doc_id"], r["clean_text"]) for r in first if r["clean_text"]]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in rewritten], pa.int64()),
            "text": pa.array([t for _, t in rewritten], pa.string()),
            "lang": pa.array(["en"] * len(rewritten), pa.string()),
            "source": pa.array(["s"] * len(rewritten), pa.string()),
            "n_chars": pa.array([len(t) for _, t in rewritten], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    second = SPECS["passage_dedup_rewrite"].spark(spark, str(tmp_path)).collect()
    assert len(second) == len(rewritten)
    offenders = [r for r in second if r["n_kept"] != r["n_passages"]]
    assert not offenders, f"second pass still drops passages: {offenders[:3]}"


def test_passage_dedup_degenerate_docs_match_oracle(spark, tmp_path):
    """NULL, empty, and whitespace-only docs have zero passages; both
    engines must still emit their (doc_id, 0, 0, '') rows (Spark's left
    join vs the oracle's LEFT JOIN from documents) instead of dropping
    them from one side only — the fixture never exercises this."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = {0: None, 1: "", 2: "   ", 3: "alpha beta gamma", 4: "alpha beta gamma"}
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t or "") for t in texts.values()], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    spec = SPECS["passage_dedup_rewrite"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    compare(df, con, spec.oracle)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == set(texts), "degenerate docs must not drop out"
    for d in (0, 1, 2):
        assert (rows[d]["n_passages"], rows[d]["n_kept"], rows[d]["clean_text"]) == (0, 0, "")
    assert rows[3]["n_kept"] == 1 and rows[4]["n_kept"] == 0  # dup passage dropped


def test_pps_total_multiplicity_is_exactly_k(spark, sf_dir):
    """The systematic-PPS invariant: Σ multiplicity == k exactly —
    ⌊k(s+w)/W⌋ − ⌊ks/W⌋ telescopes over the weight line to ⌊kW/W⌋ = k.
    A wrong prefix sum (overlap or gap between spans) breaks the
    telescope, so this single number certifies the whole two-level
    offset assembly, not just the selected rows."""
    from currency_etl_pipeline_spark.queries.llm_prep import _PPS_K

    df = SPECS["pps_systematic_sample"].spark(spark, sf_dir)
    total = sum(r["multiplicity"] for r in df.collect())
    assert total == _PPS_K, f"systematic sample drew {total} != k={_PPS_K}"


def test_pps_giant_doc_gets_proportional_multiplicity(spark, tmp_path):
    """A document owning ~half the corpus weight must be selected with
    multiplicity ≈ k/2 (PPS's whole point: P ∝ size, long docs drawn
    more than once). The sf fixture's sizes are too uniform to ever
    exercise multiplicity ≥ 2. Also engine-parity on the planted
    corpus."""
    import duckdb

    from currency_etl_pipeline_spark.queries.llm_prep import _PPS_K

    rows = [(i, "x" * 10, "en", "s") for i in range(50)]
    rows.append((50, "y" * 500, "en", "s"))  # 500 of 1000 chars total
    _write_docs(tmp_path, rows)
    spec = SPECS["pps_systematic_sample"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    compare(df, con, spec.oracle)
    got = {r["doc_id"]: r["multiplicity"] for r in df.collect()}
    assert got.get(50) == _PPS_K // 2, f"giant doc multiplicity: {got.get(50)}"
    assert sum(got.values()) == _PPS_K


def test_peak_concurrency_midnight_crossing(spark, tmp_path):
    """Sweep-line correctness on a planted midnight-crossing overlap —
    the case the day-split device exists for: user 1's session spans
    23:40→00:20+30m and must carry +1 into day 2 at 00:00, where user
    3's early-morning session overlaps it. The sf fixture's sessions
    are dense enough that the per-day peak never hinges on ONE
    cross-midnight carry. Also engine-parity on the planted events."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    def ts(day, h, m):
        return datetime(2024, 3, day, h, m)

    rows = [  # (event_id, user_id, ts)
        (0, 1, ts(1, 23, 40)),  # u1: 23:40 + 00:05 next day (25 min gap →
        (1, 1, ts(2, 0, 5)),    #     ONE session [23:40, 00:35) across midnight)
        (2, 2, ts(1, 23, 50)),  # u2: one event, session [23:50, 00:20) day1→2
        (3, 3, ts(2, 0, 30)),   # u3: [00:30, 01:00) day2, overlaps u1's tail
        (4, 4, ts(1, 10, 0)),   # u4: isolated midday day1
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["e"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    spec = SPECS["peak_concurrent_sessions"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    compare(df, con, spec.oracle)
    got = {str(r["day"]): (r["peak_concurrent"], r["n_sessions"]) for r in df.collect()}
    # day1: u1+u2 overlap 23:50–24:00 (peak 2); u4 alone midday; 3 starts.
    # day2: u1 carried (live 00:00–00:35) + u2 carried (→00:20) + u3
    # (00:30–01:00): peak 2 twice (u1&u2 then u1&u3) — never 3 (u2 ends
    # before u3 starts); 3 segment starts (two of them midnight carries).
    assert got["2024-03-01"] == (2, 3), got
    assert got["2024-03-02"] == (2, 3), got


def test_fuzzy_match_planted_typo_and_block_miss(spark, tmp_path):
    """The blocking contract, both directions: a same-noun typo pair
    IS caught (edit distance 1), a cross-block typo (typo in the head
    noun itself) is NOT — the documented recall/cost trade. Also
    engine-parity (Spark and DuckDB levenshtein must agree)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    names = [
        "cold anvil", "cold anvil", "old anvil",  # dist 1, same block
        "green sled", "green slex",               # head-noun typo: blocked apart
        "red wrench",
    ]
    tbl = pa.table(
        {
            "p_partkey": pa.array(range(len(names)), pa.int64()),
            "p_name": pa.array(names, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "part.parquet"))
    spec = SPECS["fuzzy_part_name_match"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{tmp_path}/part.parquet'")
    compare(df, con, spec.oracle)
    pairs = {(r["name_a"], r["name_b"]): r for r in df.collect()}
    assert ("cold anvil", "old anvil") in pairs
    assert pairs[("cold anvil", "old anvil")]["n_parts_a"] == 2  # carried cardinality
    assert not any("sle" in a for a, _ in pairs), "cross-block typo must be missed"


def test_token_diversity_extremes_and_null(spark, tmp_path):
    """Gini endpoints pinned: an all-repeated doc scores exactly 0, an
    all-distinct doc exactly 1 − 1/n, and NULL text drops in both
    engines — the semantics the docstring sells (spam vs natural docs
    with identical stopword ratios)."""
    import duckdb

    _write_docs(
        tmp_path,
        [(0, "the the the the", "en", "s"), (1, "a b c d", "en", "s"), (2, None, "en", "s")],
    )
    spec = SPECS["token_diversity_gini"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    compare(df, con, spec.oracle)
    got = {r["doc_id"]: r for r in df.collect()}
    assert set(got) == {0, 1}, "null-text doc must drop"
    assert got[0]["gini_diversity"] == 0.0
    assert got[1]["gini_diversity"] == 0.75  # 1 − 4/16


def test_autocorr_sign_and_degenerate_guard(spark, tmp_path):
    """A strictly alternating series must score r = −1 (each tick the
    opposite of the last) and a constant series must emit NULL via the
    explicit zero-variance guard — the engine-divergence case (Spark
    /0 → NULL vs DuckDB → ±inf) the fixture never reaches. Also
    engine-parity on the planted events."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for i in range(8):
        rows.append((i, "alt", 1.0 if i % 2 == 0 else 3.0))
        rows.append((100 + i, "const", 2.0))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "ts": pa.array(
                [1_700_000_000_000_000 + r[0] * 1_000_000 for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    spec = SPECS["value_autocorr_lag1"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    compare(df, con, spec.oracle)
    got = {r["event_type"]: r["autocorr_lag1"] for r in df.collect()}
    assert got["alt"] == -1.0, got
    assert got["const"] is None, got


def test_pagerank_planted_chain_center_wins(spark, tmp_path):
    """The ranking claim PageRank is IN the catalog for, on a PLANTED
    irregular graph: the sf fixture's organic near-dup components are
    all REGULAR (exact-dup pairs/cliques), where the power iteration's
    fixed point is exactly the uniform 1e9 for every vertex — degree
    and PageRank agree and discriminate nothing. A chain a~b~c (found
    by offline search over disjoint-vocabulary triples against the
    registered 8-hash/4-band family: a=w[0:30], b=w[15:45], c=w[30:60]
    band-collide only adjacently) is the smallest graph where they
    differ. Exact integer expectations pin the floor-div iteration:
    center r3 = 1 741 625 000, ends = 629 187 500 (hand-unrolled).
    Also engine-parity on the planted corpus."""
    import duckdb

    w = [f"t12w{i}" for i in range(60)]
    _write_docs(
        tmp_path,
        [
            (0, " ".join(w[0:30]), "en", "s"),
            (1, " ".join(w[15:45]), "en", "s"),
            (2, " ".join(w[30:60]), "en", "s"),
        ],
    )
    spec = SPECS["near_dup_pagerank"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    compare(df, con, spec.oracle)
    got = {r["doc_id"]: r for r in df.collect()}
    assert set(got) == {0, 1, 2}
    assert got[1]["rank_e9"] == 1_741_625_000, got[1]
    assert got[0]["rank_e9"] == got[2]["rank_e9"] == 629_187_500
    assert got[1]["pos"] == 1 and (got[0]["degree"], got[1]["degree"]) == (1, 2)


def test_containment_catches_wrapper_jaccard_misses(spark, tmp_path):
    """The asymmetric case the query exists for: a 12-token quote fully
    embedded in a ~100-token page has containment 1.0 but Jaccard
    ≈ 0.1 — doc_containment_pairs must emit it oriented
    (small, big) and near_dup_jaccard_pairs must NOT see it. The
    organic fixture's containment-1.0 pairs are almost all exact dups
    (jaccard 1.0), so the gap case needs planting. Also engine-parity
    on the planted corpus."""
    import duckdb

    quote = " ".join(f"q{i}" for i in range(12))
    page = " ".join(f"p{i}" for i in range(60)) + " " + quote + " " + " ".join(
        f"r{i}" for i in range(40)
    )
    _write_docs(
        tmp_path,
        [(0, page, "en", "s"), (1, quote, "en", "s"), (2, "unrelated words here now", "en", "s")],
    )
    spec = SPECS["doc_containment_pairs"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    compare(df, con, spec.oracle)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_small"], r["doc_big"]) == (1, 0), "must orient small→big"
    assert r["containment"] == 1.0 and r["jaccard"] < 0.15, r
    jac = SPECS["near_dup_jaccard_pairs"].spark(spark, str(tmp_path)).collect()
    assert jac == [], "symmetric Jaccard must structurally miss the wrapper"


def test_token_drift_planted_shift(spark, tmp_path):
    """A token that disappears between ingestion halves must rank #1
    with direction 'down'; a heavy but evenly-split token must NOT
    outrank it (chi-square scores the SHIFT, not the volume); tokens
    under the min-count floor are excluded. The sf fixture's organic
    drift is mild (χ² ≤ 8), so the discriminating case needs planting.
    Also engine-parity on the planted corpus."""
    import duckdb

    base = "alpha beta gamma delta " * 10  # 40 even background tokens/doc
    rows = []
    for i in range(4):  # first half: doc_id 0..3 (mid = (0+7)//2 = 3)
        rows.append((i, base + "vanish " * 8, "en", "s"))
    for i in range(4, 8):
        rows.append((i, base, "en", "s"))
    _write_docs(tmp_path, rows)
    spec = SPECS["token_drift_report"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    compare(df, con, spec.oracle)
    rows_out = sorted(df.collect(), key=lambda r: r["pos"])
    assert rows_out[0]["token"] == "vanish", rows_out[:3]
    assert rows_out[0]["direction"] == "down"
    assert (rows_out[0]["n_first"], rows_out[0]["n_second"]) == (32, 0)
    # background tokens are present (≥ min count) but far below the
    # planted shift (their per-half counts are equal; their small χ²
    # comes only from the totals imbalance the planted token causes)
    assert {r["token"] for r in rows_out} >= {"alpha", "beta", "gamma", "delta"}
    assert all(r["chi2"] < rows_out[0]["chi2"] / 4 for r in rows_out[1:])


def test_neyman_total_is_k_and_variance_drives_allocation(spark, sf_dir, tmp_path):
    """Largest-remainder apportionment must hand out EXACTLY k seats
    (no stratum hits its N_h cap on the fixture), and on a planted
    corpus two equal-SIZE strata must split unequally — the
    high-variance one gets more probes, which is the entire point of
    Neyman over proportional allocation. Engine-parity on the planted
    corpus too."""
    import duckdb

    from currency_etl_pipeline_spark.queries.llm_prep import _NEYMAN_K

    df = SPECS["stratified_neyman_sample"].spark(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == _NEYMAN_K, f"allocation must telescope to k={_NEYMAN_K}"
    per = {}
    for r in rows:
        per[r["source"]] = r["alloc"]
    assert sum(per.values()) == _NEYMAN_K

    # planted: same N, wildly different spread
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_rows = []
    for i in range(40):
        n_rows.append((i, "x", "en", "varied", 10 if i % 2 == 0 else 2000))
        n_rows.append((100 + i, "x", "en", "flat", 500))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in n_rows], pa.int64()),
            "text": pa.array([r[1] for r in n_rows], pa.string()),
            "lang": pa.array([r[2] for r in n_rows], pa.string()),
            "source": pa.array([r[3] for r in n_rows], pa.string()),
            "n_chars": pa.array([r[4] for r in n_rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    spec = SPECS["stratified_neyman_sample"]
    pdf = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    compare(pdf, con, spec.oracle)
    alloc = {r["source"]: r["alloc"] for r in pdf.collect()}
    # flat stratum has stddev 0 → weight 0 → all seats go to 'varied',
    # capped at its 40 docs (the documented no-redistribution shortfall)
    assert alloc["varied"] == 40 and "flat" not in alloc, alloc


def test_centroid_similarity_geometry_endpoints(spark, tmp_path):
    """Pinned geometry: two labels with identical mean direction score
    cosine 1.0, orthogonal labels score 0.0, and an all-zero-centroid
    label hits the NULL guard in BOTH engines (Spark /0 → NULL vs
    DuckDB → ±inf/nan — the divergence class the guard exists for).
    Also engine-parity on the planted vectors."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 64
    def vec(*hot):  # unit spikes on the given dims
        v = [0.0] * dim
        for h in hot:
            v[h] = 1.0
        return v

    rows = [
        (0, vec(0), 0), (1, vec(0, 1), 0),      # label 0: mean ~ (1, .5, 0...)
        (2, vec(0), 1), (3, vec(0, 1), 1),      # label 1: same mean → cos 1
        (4, vec(5), 2), (5, vec(6), 2),         # label 2: ⊥ to 0/1 → cos 0
        (6, [0.0] * dim, 3),                    # label 3: zero centroid → NULL
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    spec = SPECS["label_centroid_similarity"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'")
    compare(df, con, spec.oracle)
    got = {(r["label_a"], r["label_b"]): r["cosine"] for r in df.collect()}
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == 0.0 and got[(1, 2)] == 0.0
    assert got[(0, 3)] is None and got[(2, 3)] is None, "zero centroid must guard to NULL"


def test_transition_lift_planted_flow(spark, tmp_path):
    """Two user populations alternate inside DISJOINT vocabularies
    (view↔buy vs a↔b): all four within-vocabulary transitions must
    surface with exact hand-computed lifts (the return edge scores
    higher — its src AND dst marginals are the rarer ones: 12·60/12²=5
    vs 18·60/18²=10/3), and NO cross-vocabulary transition may appear —
    the lead() window is per-user, so transitions can never leak
    across user boundaries. Also engine-parity on the planted events."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    for u in range(6):  # flow users: view buy view buy ...
        for k in range(6):
            rows.append((eid, u, "view" if k % 2 == 0 else "buy")); eid += 1
    for u in range(6, 12):  # noise users: a b a b ... (own vocabulary)
        for k in range(6):
            rows.append((eid, u, "a" if k % 2 == 0 else "b")); eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "ts": pa.array(
                [1_700_000_000_000_000 + r[0] * 1_000_000 for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    spec = SPECS["event_transition_lift"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    compare(df, con, spec.oracle)
    got = {(r["src"], r["dst"]): r["lift"] for r in df.collect()}
    assert got == {
        ("buy", "view"): 5.0,
        ("b", "a"): 5.0,
        ("view", "buy"): 3.333333,
        ("a", "b"): 3.333333,
    }, got


def test_concurrent_pairs_hand_computed_overlap(spark, tmp_path):
    """Exact-microsecond overlap on the midnight fixture, hand-checked:
    u1 [23:40, 00:35) × u2 [23:50, 00:20) overlap 23:50→00:20 = 30 min;
    u1 × u3 [00:30, 01:00) overlap 00:30→00:35 = 5 min — the u1×u2
    overlap SPANS midnight, so it arrives as multiple boundary-clamped
    segments whose durations must SUM exactly to 30 min while n_joint
    counts the SESSION PAIR once (the r10 shard-invariant semantics:
    the count keys on session identity, not on how the shard unit
    happened to slice it); u2 × u3 touch nothing. u4 ends exactly when
    u5 starts (end == start): touching sessions must NOT pair. Also
    engine-parity on the planted events."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    def ts(day, h, m):
        return datetime(2024, 3, day, h, m)

    rows = [
        (0, 1, ts(1, 23, 40)), (1, 1, ts(2, 0, 5)),   # u1: [23:40, 00:35)
        (2, 2, ts(1, 23, 50)),                         # u2: [23:50, 00:20)
        (3, 3, ts(2, 0, 30)),                          # u3: [00:30, 01:00)
        (4, 4, ts(1, 10, 0)),                          # u4: [10:00, 10:30)
        (5, 5, ts(1, 10, 30)),                         # u5: [10:30, 11:00) touches u4
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["e"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    spec = SPECS["concurrent_session_pairs"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    compare(df, con, spec.oracle)
    got = {(r["user_a"], r["user_b"]): (r["n_joint"], r["overlap_us"]) for r in df.collect()}
    assert got[(1, 2)] == (1, 30 * 60 * 1_000_000), got  # one pair, segments sum
    assert got[(1, 3)] == (1, 5 * 60 * 1_000_000), got
    assert (2, 3) not in got and (4, 5) not in got, "touching must not pair"


def test_rrf_fusion_arithmetic_and_overlap(spark, sf_dir):
    """The fused score must equal the floor-div identity recomputed
    from the emitted ranks (1e9 // (60+rank) per present signal), the
    top-10 must be ordered by it with the doc_id tie-break, and at
    least one doc must carry BOTH ranks — the BM25 seeds sit inside
    the pseudo-relevance centroid, so lexical and semantic lists
    overlap by construction; all-NULL-on-one-side would mean the
    full-outer join or the id alignment silently broke."""
    rows = sorted(
        SPECS["hybrid_rrf_retrieval"].spark(spark, sf_dir).collect(),
        key=lambda r: r["pos"],
    )
    assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        expect = 0
        if r["rank_kw"] is not None:
            expect += 1_000_000_000 // (60 + r["rank_kw"])
        if r["rank_sem"] is not None:
            expect += 1_000_000_000 // (60 + r["rank_sem"])
        assert r["rrf_e9"] == expect, r
    assert rows == sorted(rows, key=lambda r: (-r["rrf_e9"], r["doc_id"]))
    assert any(
        r["rank_kw"] is not None and r["rank_sem"] is not None for r in rows
    ), "lexical and semantic lists must overlap on the seeds"


def test_mad_catches_what_sigma_masking_hides(spark, tmp_path):
    """The robustness claim, pinned: two extreme points inflate the
    stddev enough that their OWN z-scores stay under the 3-sigma
    convention (classic masking — ~2.1 sigma each here), while the
    median/MAD fence flags exactly both. Doubled-unit expectations are
    hand-computed: med2 = 2*15.5 = 31e6 q6-units, mad4 = 2*(2*3) =
    12e6, fence 2*dev > 3*mad4 catches only the planted pair. Also
    engine-parity on the planted events."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0, 18.0, 19.0, 1000.0, 1001.0]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(vals)), pa.int64()),
            "user_id": pa.array([1] * len(vals), pa.int64()),
            "event_type": pa.array(["t"] * len(vals), pa.string()),
            "value": pa.array(vals, pa.float64()),
            "ts": pa.array(
                [1_700_000_000_000_000 + i * 1_000_000 for i in range(len(vals))],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    spec = SPECS["mad_outlier_report"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    compare(df, con, spec.oracle)
    row = df.collect()[0]
    assert (row["n"], row["med2_e6"], row["mad4_e6"], row["n_outliers"]) == (
        12, 31_000_000, 12_000_000, 2,
    ), row
    z = {
        r["event_id"]: r["zscore"]
        for r in SPECS["events_anomaly_zscore"].spark(spark, str(tmp_path)).collect()
    }
    assert abs(z[10]) < 3 and abs(z[11]) < 3, (
        f"masking precondition broke: {z[10]}, {z[11]} — the MAD report's "
        "reason to exist is that these sit under the 3-sigma fence"
    )


def test_quantile_normalize_singleton_and_ties(spark, tmp_path):
    """The degenerate cases the fixture never reaches: a singleton
    type must emit q = 0.0 in BOTH engines (Spark percent_rank vs
    DuckDB disagree on n=1 conventions — the explicit CASE is the
    guard), and tied values must share one q under RANK semantics
    (deterministic without an event_id tie-break). Engine-parity on
    the planted events included."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(0, "solo", 7.0), (1, "t", 1.0), (2, "t", 2.0), (3, "t", 2.0), (4, "t", 4.0)]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "ts": pa.array(
                [1_700_000_000_000_000 + r[0] for r in rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    spec = SPECS["quantile_normalize_values"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    compare(df, con, spec.oracle)
    got = {r["event_id"]: r["q"] for r in df.collect()}
    assert got[0] == 0.0, "singleton type must pin to 0.0"
    assert got[2] == got[3] == round(1 / 3, 9), "ties must share RANK-based q"
    assert got[1] == 0.0 and got[4] == 1.0


def test_dedup_recall_report_orders_the_methods(spark, sf_dir):
    """The report's findings, pinned as a regression net: minhash
    (est >= 0.5) and containment grade perfectly on this fixture's
    clean separation (planted dups J >= 0.89, background <= 0.1).
    Simhash is pinned to its r11 PRODUCTION contract — banded
    candidates verified by exact Jaccard >= 0.5 must reach precision
    >= 0.5 at recall >= 0.7 against the 0.6 truth (r10 measured the
    unverified fingerprint at precision 0.008; if an edit ever drops
    simhash back below this bar, the verify stage has regressed)."""
    from currency_etl_pipeline_spark.queries.registry import _REGISTRY

    rows = {
        r["method"]: r.asDict()
        for r in _REGISTRY["dedup_recall_report"].spark(spark, sf_dir).collect()
    }
    assert rows["minhash"]["prec"] == 1.0 and rows["minhash"]["recall"] == 1.0
    assert rows["containment"]["prec"] == 1.0 and rows["containment"]["recall"] == 1.0
    assert rows["simhash"]["prec"] >= 0.5 and rows["simhash"]["recall"] >= 0.7
    assert rows["simhash"]["n_pred"] <= 2 * rows["simhash"]["n_truth"], (
        "verified simhash must not over-predict the truth set by >2x"
    )
    assert rows["minhash"]["n_truth"] > 0


def test_semdedup_degenerate_vectors_match_oracle(spark, tmp_path):
    """Zero-norm vectors must be DROPPED (cosine would divide by zero
    in assignment) and a singleton cell must emit its unpruned row —
    in both engines. The fixture never exercises either (no zero
    vectors; every fixed cell is populated). Construct: 8 axis-aligned
    centroids (vec_ids 20..27), one zero vector, one lone vector near
    centroid 0, a duplicate pair near centroid 1."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 64

    def vec(**comps):
        v = [0.0] * dim
        for i, x in comps.items():
            v[int(i)] = float(x)
        return v

    # Centroids are corpus rows too (the fixed-centroid convention), so
    # non-centroid vectors sit at cos ~= 0.399 of their cell's centroid
    # (0.4 on the centroid axis, 0.92 on an axis no centroid owns):
    # below tau = 0.45, still the argmax cell.
    rows = [(20 + c, vec(**{str(c): 1.0}), 0) for c in range(8)]  # centroids
    rows += [
        (1, vec(**{"0": 0.4, "8": 0.92}), 1),         # lone vector, cell 0
        (2, vec(**{"1": 0.4, "9": 0.92}), 1),         # dup pair, cell 1
        (3, vec(**{"1": 0.4, "9": 0.92}), 1),         # identical → pruned
        (4, [0.0] * dim, 1),                          # zero-norm → dropped
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    spec = SPECS["semdedup_cell_prune"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'")
    compare(df, con, spec.oracle)
    out = {r["vec_id"]: r.asDict() for r in df.collect()}
    assert 4 not in out, "zero-norm vector must be dropped, not crash"
    assert out[1]["pruned"] is False and out[1]["n_dup_neighbors"] == 0
    assert out[2]["pruned"] is False and out[3]["pruned"] is True
    assert out[3]["n_dup_neighbors"] == 1
