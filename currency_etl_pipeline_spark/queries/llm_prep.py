"""Training-data preparation operators over `documents` — the
LLM-pipeline extensions beyond scoring/dedup (SURVEY.md §7 Phase 6
north star; complements queries/text.py).

The reference's pipeline ends at "load the cleaned table"
(load.py:1-34); a training-data user needs the steps AFTER cleaning:
splitting the corpus, packing documents into fixed token budgets,
and corpus-level term statistics. Each query here is the Spark-native
shape of one of those steps with a DuckDB oracle twin.

Scale notes:
- sequence packing uses the two-level distributed prefix sum (block
  local cumsum + tiny block-offset table broadcast back), NOT a
  single global window — a global `ORDER BY doc_id` window is one
  partition no matter the cluster;
- the split is a pure stateless hash — no shuffle until the final
  stats agg; at 100 TB it is a map-only stage feeding partitioned
  writes;
- tf-idf shuffles (doc_id, term) pairs once and the per-term document
  frequencies once — both narrow integer/string rows, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.queries.text import (
    exploded,
    rolled_window_hashes,
    shingles,
    token_hashes,
    tokens,
)
from currency_etl_pipeline_spark.tables import load_table, spread

_TOKS_DUCK = "regexp_split_to_array(trim(text), '\\s+')"

# Token budget per packed training sequence and the prefix-sum block
# width. 64 docs/block keeps the sf0.01 test data multi-block (500
# docs → 8 blocks/lang); at real scale the block is the unit whose
# offsets table must stay driver-small (1e10 docs / 1e5-doc blocks →
# 1e5 offset rows — trivially broadcastable).
PACK_BUDGET = 512
PACK_BLOCK = 64
# Hard cap on the per-stratum block-offset table the packer broadcasts
# back. The offsets table has one row per (stratum, block); with the
# default 2^17 cap the broadcast is ≤ ~131k narrow rows per stratum —
# a few MB — at ANY corpus size, because packed_docs RAISES (inside
# the plan, no extra job) when a stratum's block count exceeds the
# cap instead of silently forcing a corpus-proportional broadcast.
# At 100 TB the caller widens `block` (1e10 docs / 1e5-doc blocks →
# 1e5 offsets rows); the error message says exactly that.
PACK_MAX_BLOCKS = 1 << 17


def packed_docs(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    block: int = PACK_BLOCK,
    strata: tuple[str, ...] = ("lang",),
    max_blocks: int = PACK_MAX_BLOCKS,
    token_count: "F.Column | None" = None,
) -> DataFrame:
    """Per-document shard assignment via the two-level distributed
    prefix sum (see sequence_packing's docstring for the scale
    argument). Returns (doc_id, *strata, n_tokens, shard_id); reused by
    the sequence_packing query and the sources/shards.py sink.

    ``strata`` are the independent packing partitions — shard ids
    restart at 0 and pack contiguously WITHIN each stratum. The
    standalone query packs per ("lang",); the shard sink packs per
    ("split", "lang") so each split's shards are gap-free full-budget
    packs (packing corpus-wide and splitting afterwards would slice
    shards across splits: under-budget shards with doc gaps where the
    other splits' documents were removed).

    ``token_count`` overrides the per-document token counter (default:
    whitespace token count). Pass a Column over ``docs``'s columns —
    e.g. a precomputed BPE count joined onto the corpus
    (run_training_data_pipeline(bpe_tokens=True)) — so shard budgets
    meter what the training dataloader actually consumes."""
    # The (lang, block) repartition makes the window branch and the
    # block-offsets branch read ONE exchange (ReusedExchange,
    # plan-test pinned) — the tokenizer below it runs once; only
    # (doc_id, lang, n_tokens, block) longs shuffle, never text. Both
    # branches must share the exchange subtree BIT-IDENTICALLY, so the
    # join-key null filters are applied explicitly below it (or
    # constraint inference pushes them asymmetrically per branch) and
    # the offsets derive FROM the windowed output (block_sum = last
    # row's running total) instead of a separate aggregate lineage.
    strata = tuple(strata)
    not_null = F.col("block").isNotNull()
    for k in strata:
        not_null = not_null & F.col(k).isNotNull()
    # The override is a public surface (write_training_shards'
    # token_count): a NULL in a caller-supplied counter would land
    # NULL n_tokens rows whose window prefix-sum silently treats them
    # as 0 — undercounting shard budgets with no error. Pin the
    # treats-as-0 behavior explicitly. The DEFAULT counter keeps its
    # NULL (null-text docs), matching the sequence_packing oracle.
    counter = (
        F.coalesce(token_count, F.lit(0).cast("long"))
        if token_count is not None
        else F.size(tokens())
    )
    base = (
        docs.select(
            "doc_id",
            *strata,
            counter.alias("n_tokens"),
            F.expr(f"doc_id DIV {block}").alias("block"),
        )
        .filter(not_null)
        .repartition(*strata, "block")
    )
    w_local = (
        Window.partitionBy(*strata, "block")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "local_before", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    w_block = (
        Window.partitionBy(*strata)
        .orderBy("block")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Bounded-blocks guard: the offsets broadcast is driver/executor-
    # safe ONLY while the per-stratum block count stays under
    # max_blocks. The count rides the same per-stratum window pass as
    # the offset cumsum (same partitioning — no extra exchange, no
    # extra job) and is folded into the offset expression itself so
    # column pruning cannot drop it: an over-cap stratum raises at
    # execution time instead of silently broadcasting a corpus-
    # proportional table.
    n_blocks = F.count(F.lit(1)).over(Window.partitionBy(*strata))
    cum_offset = F.coalesce(F.sum("block_sum").over(w_block), F.lit(0))
    offsets = (
        local.groupBy(*strata, "block")
        .agg(F.max(F.col("local_before") + F.col("n_tokens")).alias("block_sum"))
        .select(
            *strata,
            "block",
            F.when(n_blocks <= max_blocks, cum_offset)
            .otherwise(
                F.raise_error(
                    F.lit(
                        "packed_docs: a stratum's block-offset table exceeds "
                        f"max_blocks={max_blocks}; widen `block` (docs per "
                        "block) to keep the broadcast bounded at this corpus size"
                    )
                ).cast("bigint")
            )
            .alias("block_offset"),
        )
    )
    return (
        local.join(F.broadcast(offsets), [*strata, "block"])
        .withColumn(
            "shard_id", F.floor((F.col("block_offset") + F.col("local_before")) / budget)
        )
        .select("doc_id", *strata, "n_tokens", "shard_id")
    )


@query(
    "sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, len({_TOKS_DUCK}) AS n_tokens FROM documents
    ), c AS (
        SELECT doc_id, lang, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM t
    )
    SELECT lang,
           CAST(floor(cum_before / {PACK_BUDGET}.0) AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM c GROUP BY lang, shard_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget training shards
    (per-language, doc_id order): shard = floor(exclusive-prefix-sum /
    budget) — the contiguous greedy packing used to build
    fixed-context-length training sequences.

    The oracle is the textbook single window cumsum; the Spark plan is
    the SCALABLE equivalent: a two-level distributed prefix sum.
    Documents carry a block key (doc_id DIV 64); the within-block
    cumsum windows over (lang, block) — bounded 64-row partitions, so
    every core works — and block totals aggregate into a tiny offsets
    table whose own cumsum (|blocks| rows) broadcasts back. A single
    global `ORDER BY doc_id` window would serialize the corpus through
    one partition; this shape never materializes more than one block
    per task plus an offsets table that is ~5 orders of magnitude
    smaller than the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    return packed_docs(docs).groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "train_val_test_split",
    oracle=f"""
    WITH t AS (
        SELECT lang, n_chars, len({_TOKS_DUCK}) AS n_tokens,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'e' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(sum(n_chars) * 1.0 / count(*), 6) AS avg_chars
    FROM t GROUP BY split, lang
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split with per-language
    stratification stats. The split key is the first hex digit of
    md5(doc_id): <= 'c' → train (13/16 ≈ 81%), d-e → val (2/16),
    f → test (1/16) — reproducible across engines, runs, and cluster
    sizes because it depends only on the row's own key (no
    sample()/rand(), whose results are partitioning-dependent).

    Plan: stateless map-only projection (hash + CASE evaluate in one
    codegen stage over the scan) feeding a single partial+final agg on
    (split, lang) — 15 groups, so only counters shuffle. At 100 TB the
    same projection feeds `partitionBy(split)` parquet writes; the
    avg divides two exact integer sums once at the edge.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            _split_expr().alias("split"),
            "lang",
            F.size(tokens()).alias("n_tokens"),
            "n_chars",
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.sum("n_chars") * 1.0 / F.count(F.lit(1)), 6).alias("avg_chars"),
        )
    )


@query(
    "corpus_ngram_topk",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 1, 0)),
                   i -> array_to_string(toks[i:i+1], ' ')))) AS ngram
        FROM t
    )
    SELECT ngram, count(*) AS doc_freq
    FROM sh GROUP BY ngram
    ORDER BY doc_freq DESC, ngram LIMIT 20
    """,
)
def corpus_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram statistics: the 20 bigrams appearing in the
    most documents (document frequency, distinct per doc), ties broken
    by ngram text — the vocabulary/contamination scan a data curator
    runs before training.

    Plan: one pass builds distinct per-doc bigrams (the shingles()
    zip_with form, all codegen), explodes, and partial-aggregates
    map-side, so the shuffle carries (ngram, count) partials bounded
    by |vocabulary|², not the corpus; the final top-20 is
    TakeOrderedAndProject (per-partition heaps + driver merge of 20
    rows), never a global sort.
    """
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    grams = exploded(docs, ["doc_id"], shingles(n=2), "ngram")
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "ngram")
        .limit(20)
    )


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH ex AS (
        SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term
    ), df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM ex GROUP BY term
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ln(n.n_docs * 1.0 / df.df) DESC, tf.term
               ) AS rank
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, rank
    FROM scored WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by tf-idf (idf = ln(N/df)) — the
    classic salient-term extraction over a corpus; rank ties break on
    term text so the result is fully deterministic.

    Plan: the tokenizer runs ONCE — df is derived FROM the tf table
    (each tf row is one distinct (doc, term), so df = row count per
    term), not from a second explode of the corpus; the df branch and
    the join branch share tf's (doc_id, term) exchange
    (ReusedExchange, plan-test pinned). The df side carries NO
    broadcast hint: its cardinality is the corpus VOCABULARY, which
    grows with the corpus (Heaps' law — 10^8–10^9 distinct tokens at
    100 TB of web text), so a forced broadcast is a scale-killer; AQE
    still picks a broadcast join at any scale where df actually fits
    under autoBroadcastJoinThreshold, and falls back to a sort-merge
    join on `term` — already tf's partitioning-compatible key — when
    it doesn't. Only the 1-row corpus count (a doc_id-only scan, no
    text IO) keeps an explicit hint. The rank window partitions by
    doc_id — millions of independent small partitions, embarrassingly
    parallel. Per-row double math (ln, ×) is IEEE-deterministic in
    both engines; the 6dp round happens after ranking, at the edge.
    """
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    ex = exploded(docs, ["doc_id"], tokens(), "term")
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = load_table(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(tfidf.desc(), "term")
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", F.round(tfidf, 6).alias("tfidf"), "rank")
    )


@query(
    "doc_repetition_score",
    oracle=f"""
    WITH ex AS (
        SELECT doc_id, unnest({_TOKS_DUCK}) AS tok FROM documents
    ), c AS (
        SELECT doc_id, tok, count(*) AS cnt FROM ex GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           round(count(*) * 1.0 / sum(cnt), 6) AS distinct_ratio,
           round(max(cnt) * 1.0 / sum(cnt), 6) AS top_token_share
    FROM c GROUP BY doc_id
    """,
)
def doc_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals: distinct-token ratio and
    the share of the single most frequent token — the degenerate-text
    filter (boilerplate, keyword stuffing, decode loops) every
    training-data quality gate includes.

    Plan: ZERO-shuffle map-only codegen. The per-doc statistics are
    array-local: sort the token array (O(n log n) per doc), then one
    linear `aggregate` scan counts the longest equal-run — which IS
    the max token frequency in a sorted array — while
    `array_distinct` sizes the vocabulary. Nothing leaves the row.
    The previous explode → groupBy(doc_id, tok) form shuffled every
    distinct (doc, token) pair — nearly one row per corpus token,
    the dominant cost at any scale (and measurably so at sf0.1); the
    naive `transform(toks, t -> size(filter(...)))` form is O(n²) per
    doc and melts on long documents. This is the shape that survives
    100 TB: scan-bound, embarrassingly parallel, no exchange at all.
    """
    # NULL-text docs emit no row — the oracle's unnest() yields zero
    # rows for them, and the previous explode-based form matched that;
    # the map-only form must filter explicitly or it invents a row.
    docs = spread(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
    )
    toks = tokens()
    sorted_toks = F.array_sort(toks)
    run_scan = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("maxrun"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc.prev.eqNullSafe(x), acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.maxrun,
                F.when(acc.prev.eqNullSafe(x), acc.run + 1).otherwise(F.lit(1)),
            ).alias("maxrun"),
        ),
    )
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct"),
        F.round(n_distinct * 1.0 / n_tokens, 6).alias("distinct_ratio"),
        F.round(run_scan.maxrun * 1.0 / n_tokens, 6).alias("top_token_share"),
    )


@query(
    "domain_temperature_resample",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id, len({_TOKS_DUCK}) AS n_tokens FROM documents
    ), by_domain AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tok
        FROM t GROUP BY source
    ), planned AS (
        SELECT source, n_docs, tok,
               least(1.0, sqrt((SELECT min(tok) FROM by_domain) * 1.0 / tok)) AS keep_p
        FROM by_domain
    ), thresholds AS (
        SELECT source, n_docs, tok, keep_p,
               lpad(lower(to_hex(CAST(floor(keep_p * 16777216) AS BIGINT))), 6, '0') AS thr
        FROM planned
    )
    SELECT p.source, p.n_docs, p.tok AS total_tokens,
           round(p.keep_p, 6) AS keep_p,
           CAST(sum(CASE WHEN p.keep_p >= 1.0
                          OR substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 6) < p.thr
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN p.keep_p >= 1.0
                          OR substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 6) < p.thr
                         THEN t.n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM t JOIN thresholds p USING (source)
    GROUP BY p.source, p.n_docs, p.tok, p.keep_p
    """,
)
def domain_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened domain resampling (the multilingual /
    multi-domain mixing step: downsample overrepresented sources
    toward a alpha = 0.5 tempered distribution). With token counts
    tok_d per source, the keep probability is
    ``p_d = min(1, sqrt(min_e tok_e / tok_d))`` — the smallest domain
    is kept whole, larger domains shrink as the square root of their
    overrepresentation (the total-share normalizers cancel out of the
    ratio, and sqrt is IEEE-correctly-rounded, so both engines compute
    the identical double — a pow(x, alpha) form would not be portable).

    Per-document keeps are DETERMINISTIC, not rand(): doc_id's md5
    prefix (a uniform 24-bit integer in hex) is compared against
    floor(p_d * 2^24) rendered as a fixed-width hex string —
    lexicographic hex compare == numeric compare, reproducible across
    engines, runs, and cluster sizes, and consistent with the
    md5-prefix split family (train_val_test_split).

    Plan: the corpus is tokenized ONCE — the narrow (source, doc_id,
    n_tokens) projection is pinned with localCheckpoint (~24 bytes/doc;
    the same lineage-cut the CC loop uses) because three consumers
    read it (per-source totals, the global min, the per-doc keep
    flags) and without the pin each branch would re-scan and
    re-tokenize the text corpus (measured 3 scans). Counters only
    shuffle; the scalar min rides a 1-row broadcast; the per-source
    thresholds table (|sources| rows) broadcasts back onto the pinned
    rows for the keep flag — map-side, no second shuffle of
    documents. At 100 TB the same keep flag feeds the shard sink
    filter directly.
    """
    docs = spread(load_table(spark, sf_dir, "documents").select("source", "doc_id", "text"))
    t = docs.select("source", "doc_id", F.size(tokens()).alias("n_tokens")).localCheckpoint(
        eager=True
    )
    by_domain = t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tok")
    )
    min_tok = by_domain.agg(F.min("tok").alias("min_tok"))
    planned = by_domain.crossJoin(F.broadcast(min_tok)).withColumn(
        "keep_p", F.least(F.lit(1.0), F.sqrt(F.col("min_tok") * 1.0 / F.col("tok")))
    )
    thresholds = planned.withColumn(
        "thr",
        F.lpad(
            F.lower(F.hex(F.floor(F.col("keep_p") * 16777216).cast("long"))), 6, "0"
        ),
    ).select("source", "n_docs", "tok", "keep_p", "thr")
    kept = F.when(
        (F.col("keep_p") >= 1.0)
        | (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6) < F.col("thr")),
        1,
    ).otherwise(0)
    return (
        t.join(F.broadcast(thresholds), "source")
        .groupBy("source", "n_docs", "tok", "keep_p")
        .agg(
            F.sum(kept).alias("n_kept"),
            F.sum(kept * F.col("n_tokens")).alias("kept_tokens"),
        )
        .select(
            "source",
            "n_docs",
            F.col("tok").alias("total_tokens"),
            F.round("keep_p", 6).alias("keep_p"),
            "n_kept",
            "kept_tokens",
        )
    )


_PII_GRAFT_DUCK = """text || CASE
        WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com for details'
        WHEN doc_id % 7 = 1 THEN ' call +1 555-00' || CAST(doc_id AS VARCHAR) || ' now'
        WHEN doc_id % 7 = 2 THEN ' account 9021000' || CAST(doc_id AS VARCHAR) || ' ref'
        ELSE '' END"""


def _pii_graft():
    from pyspark.sql import functions as F

    d = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), d, F.lit("@mail.example.com for details")),
        )
        .when(F.col("doc_id") % 7 == 1, F.concat(F.lit(" call +1 555-00"), d, F.lit(" now")))
        .when(F.col("doc_id") % 7 == 2, F.concat(F.lit(" account 9021000"), d, F.lit(" ref")))
        .otherwise(F.lit("")),
    )


def _redact_pii_oracle() -> str:
    from currency_etl_pipeline_spark.functions.redact import (
        pii_counts_duck,
        redact_pii_duck,
    )

    ne, np_, ni = pii_counts_duck("pii_text")
    return f"""
    WITH grafted AS (
        SELECT doc_id, lang, {_PII_GRAFT_DUCK} AS pii_text FROM documents
    )
    SELECT doc_id, lang,
           CAST({ne} AS INT) AS n_emails,
           CAST({np_} AS INT) AS n_phones,
           CAST({ni} AS INT) AS n_ids,
           {redact_pii_duck("pii_text")} AS redacted
    FROM grafted
    """


@query("redact_pii_documents", oracle=_redact_pii_oracle())
def redact_pii_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass over the corpus: per-document email / phone /
    numeric-ID counts plus the fully masked text — the hygiene step a
    training pipeline runs between the quality gate and the shard sink
    (functions/redact.py holds the shared patterns; the streaming
    ingest gate composes the same operator).

    The fixture corpus contains no organic PII (no digits at all), so
    the query GRAFTS a deterministic synthetic layer first — emails on
    doc_id % 7 == 0, phone numbers on % 7 == 1, account IDs on
    % 7 == 2, built by identical string concatenation in both engines
    — making the oracle comparison adjudicate real redactions (~43% of
    documents change), not a vacuous no-op pass.

    Plan: pure per-row codegen (concat + three regexp_replace stages +
    three regexp_extract_all counts) over one scan — no shuffle, no
    UDF, scan-bandwidth bound at any scale, trivially parallel.
    """
    from currency_etl_pipeline_spark.functions.redact import pii_counts, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    grafted = docs.select("doc_id", "lang", _pii_graft().alias("pii_text"))
    n_emails, n_phones, n_ids = pii_counts(F.col("pii_text"))
    return grafted.select(
        "doc_id",
        "lang",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ids.alias("n_ids"),
        redact_pii(F.col("pii_text")).alias("redacted"),
    )


def _split_expr():
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return F.when(digit <= "c", "train").when(digit <= "e", "val").otherwise("test")


_SPLIT_DUCK = (
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c' THEN 'train' "
    "WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'e' THEN 'val' "
    "ELSE 'test' END"
)

def _grams_duck(n: int, digest: bool = False) -> str:
    """DuckDB twin of shingles(n) over a ``toks`` column — ONE
    template for every n-gram oracle in this module (r13 review: the
    bigram and 13-gram strings were hand-expanded copies whose slice
    bounds could silently desync). 1-based inclusive slice: i..i+n-1
    is n tokens. ``digest=True`` wraps each window in md5 — the
    oracle twin of _gram_digests_from (an independent implementation
    of the same window-equality semantics — see its docstring).
    text.py's _SHINGLES_DUCK (n=3, whitespace
    formatting predating this helper) is intentionally NOT rebuilt on
    it: regenerating that string would change the embedded SQL of
    long-green oracles byte-wise and re-tier them for no behavior
    change."""
    core = f"array_to_string(toks[i:i+{n - 1}], ' ')"
    if digest:
        core = f"md5({core})"
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len(toks) - {n - 1}, 0)),"
        f" i -> {core}))"
    )


_BIGRAMS_DUCK = _grams_duck(2)

# The published decontamination protocol (GPT-3 appx C / PaLM: 13-gram
# sliding windows) travels as md5 DIGESTS, not window strings — a
# 13-token window is ~90 chars while its digest is 32, so at 100 TB
# the inverted-index shuffle carries a third of the bytes and the
# train-side distinct vocabulary dedups fixed-width keys.
_13GRAMS_DUCK = _grams_duck(13, digest=True)


def _gram_digests_from(tv, n: int):
    """Distinct 64-bit identities of the n-token sliding windows, from
    a pre-projected ``token_hashes`` column (r14: the rolling device
    replaced md5-of-shingle-string — the window string is never
    materialized and every downstream row carries one 8-byte long
    instead of a 32-char hex digest; the DuckDB oracles keep md5
    window strings as an independent implementation of the same
    window-equality semantics, valid because equal windows always hash
    equal and the reports never expose a digest. r15: the last md5
    consumer, `decontaminated_train_split`, moved here and the legacy
    `_gram_digests` wrapper is gone). ``tv`` must be an
    attribute reference to an already-projected token_hashes() alias —
    see its docstring for why inline re-hashes n-fold."""
    return F.array_distinct(rolled_window_hashes(tv, n))


def _contamination_report(
    spark: SparkSession, sf_dir: str, n: int, *, verdict: bool
) -> DataFrame:
    """ONE device for the n-gram contamination family (r14, VERDICT
    task 5 — `ngram_contamination` and `contamination_13gram` were
    hand-maintained copies of the same shape differing only in n and
    report columns, the desync hazard _grams_duck's docstring records
    for their SQL twins). Per test-split document: its distinct
    n-token window identities left-joined against the train split's
    distinct window vocabulary.

    Plan: the two branches look like a shared-subtree trap, but the
    split predicate is a pure function of doc_id, so Catalyst pushes
    each branch's filter BELOW its explode into the scan — the train
    branch windows only train documents (~81% of the corpus) and the
    test branch only test documents (~6%); total tokenizer work is
    ~0.87 corpus passes across disjoint rows, cheaper than any shared
    single pass over everything. Train grams collapse to a distinct
    vocabulary (map-side partial distinct, |vocabulary|-bounded) that
    joins the test grams on gram — the inverted-index equi-join
    shape; only 8-byte rolling-hash longs shuffle (r14 — previously
    32-char md5 hex for n=13 and raw window strings for n=2), never
    text. ``verdict=True`` emits the published decontamination-report
    columns (window count, collisions, contaminated bit);
    ``verdict=False`` the ratio-report columns."""
    t = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text")).select(
        "doc_id", _split_expr().alias("split"), token_hashes().alias("tv")
    )
    sh = exploded(t, ["doc_id", "split"], _gram_digests_from(F.col("tv"), n), "gram")
    train_grams = (
        sh.filter(F.col("split") == "train").select("gram").distinct()
        .withColumn("seen", F.lit(1))
    )
    test_docs = sh.filter(F.col("split") == "test").select("doc_id", "gram")
    hit = F.when(F.col("seen").isNotNull(), 1).otherwise(0)
    grouped = test_docs.join(train_grams, "gram", "left").groupBy("doc_id")
    if verdict:
        return grouped.agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(hit).cast("long").alias("n_contaminated"),
            (F.sum(hit) > 0).alias("is_contaminated"),
        )
    return grouped.agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(hit).alias("n_contaminated"),
        F.round(F.sum(hit) * 1.0 / F.count(F.lit(1)), 6).alias("contamination_ratio"),
    )


@query(
    "ngram_contamination",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_SPLIT_DUCK} AS split, {_TOKS_DUCK} AS toks FROM documents
    ), sh AS (
        SELECT doc_id, split, unnest({_BIGRAMS_DUCK}) AS ngram FROM t
    ), train_grams AS (
        SELECT DISTINCT ngram FROM sh WHERE split = 'train'
    ), test_docs AS (
        SELECT doc_id, ngram FROM sh WHERE split = 'test'
    )
    SELECT d.doc_id,
           count(*) AS n_ngrams,
           CAST(sum(CASE WHEN tg.ngram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           round(sum(CASE WHEN tg.ngram IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS contamination_ratio
    FROM test_docs d LEFT JOIN train_grams tg ON d.ngram = tg.ngram
    GROUP BY d.doc_id
    """,
)
def ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination scan at n=2: for every held-out
    (test-split) document, the fraction of its distinct bigrams that
    also appear anywhere in the train split — the pre-training hygiene
    check that catches benchmark leakage before a model memorizes its
    own eval. The bigram demonstrator of the family;
    `contamination_13gram` is the published-protocol instance. Both
    are `_contamination_report` (r14 unification — see its docstring
    for the plan/pushdown argument; the oracle SQL is byte-identical
    to the long-green r4 original, window equality being hash-function
    independent)."""
    return _contamination_report(spark, sf_dir, 2, verdict=False)


# ONE oracle for the batch scan and its streaming gate twin
# (streaming_queries.streaming_contamination_gate) — the driven stream
# must land on the identical per-test-doc report no matter how
# micro-batches sliced the corpus (the _CDC_ORACLE single-source
# precedent).
_CONTAM13_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, {_SPLIT_DUCK} AS split, {_TOKS_DUCK} AS toks FROM documents
    ), sh AS (
        SELECT doc_id, split, unnest({_13GRAMS_DUCK}) AS gram FROM t
    ), train_grams AS (
        SELECT DISTINCT gram FROM sh WHERE split = 'train'
    ), test_docs AS (
        SELECT doc_id, gram FROM sh WHERE split = 'test'
    )
    SELECT d.doc_id,
           count(*) AS n_windows,
           CAST(sum(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           sum(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
             AS is_contaminated
    FROM test_docs d LEFT JOIN train_grams tg ON d.gram = tg.gram
    GROUP BY d.doc_id
    """


@query(
    "contamination_13gram",
    oracle=_CONTAM13_ORACLE,
)
def contamination_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination at the PUBLISHED protocol (r13, VERDICT
    task 4): 13-gram sliding windows — the GPT-3 appendix-C / PaLM
    decontamination standard — instead of `ngram_contamination`'s
    bigram demonstrator. Per test-split document: how many distinct
    13-token windows it has, how many also occur anywhere in the train
    split, and the protocol's verdict bit (any collision →
    contaminated). Windows travel as fixed-width digests end to end —
    8-byte rolling-hash longs since r14 (~90 bytes for the window
    string, 32 for the r13 md5 hex) — which is what makes the
    protocol cheap at 100 TB: the train-side distinct vocabulary and
    the inverted-index equi-join shuffle fixed-width keys, never text.

    Plan: `_contamination_report` at n=13 with the verdict columns
    (r14 unification with the bigram demonstrator — see its docstring
    for the pushdown argument; window identities are now 8-byte
    rolling-hash longs, narrower still than the md5 digests this
    query shipped with, while the oracle keeps md5 window strings as
    an independent equality implementation). Non-vacuous at the
    driver's sf0.01 (2 contaminated test docs / 25 hit windows; 26
    docs at sf0.1 — the planted near-duplicate pairs straddling the
    split)."""
    return _contamination_report(spark, sf_dir, 13, verdict=True)


@query(
    "stratified_sample_per_lang",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (
                   PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang, n_chars, rn FROM ranked WHERE rn <= 10
    """,
)
def stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: 10 documents per language,
    chosen by md5(doc_id) rank — a reproducible uniform sample (the
    hash is uncorrelated with any document property) that never uses
    rand()/sample(), whose output depends on partitioning and seed
    plumbing.

    Plan: per-stratum top-k by hash rank — a window row_number over
    (lang), i.e. the same rank-and-filter shape as latest_rate_per_key;
    Spark's WindowGroupLimit pushes the rn <= 10 limit into per-
    partition heaps before the final window, so the shuffle carries at
    most k rows per stratum per input partition, not the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
    )


@query(
    "domain_mix_report",
    oracle=f"""
    WITH t AS (
        SELECT source, lang, len({_TOKS_DUCK}) AS n_tokens FROM documents
    ), by_domain AS (
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        FROM t GROUP BY source, lang
    )
    SELECT source, lang, n_docs, total_tokens,
           round(total_tokens * 1.0 / sum(total_tokens) OVER (), 6) AS token_share,
           round(total_tokens * 1.0 / sum(total_tokens)
                 OVER (PARTITION BY lang), 6) AS share_within_lang
    FROM by_domain
    """,
)
def domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture report: per (source, lang) token counts with each
    cell's share of the global token budget and of its language — the
    table a pretraining-data owner reads before reweighting domains.

    Plan: the corpus collapses to |sources|×|langs| rows in one
    partial+final agg (only counters shuffle); the share windows run
    over that ~100-row aggregate, so the empty-frame global window —
    an anti-pattern on raw data — is a no-op here by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    by_domain = (
        docs.select("source", "lang", F.size(tokens()).alias("n_tokens"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    w_all = Window.partitionBy()
    w_lang = Window.partitionBy("lang")
    share = F.round(F.col("total_tokens") * 1.0 / F.sum("total_tokens").over(w_all), 6)
    share_lang = F.round(
        F.col("total_tokens") * 1.0 / F.sum("total_tokens").over(w_lang), 6
    )
    return by_domain.select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        share.alias("token_share"),
        share_lang.alias("share_within_lang"),
    )


def _cross_split_leakage_oracle() -> str:
    from currency_etl_pipeline_spark.queries.text import _SHINGLES_DUCK

    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS_DUCK} AS toks, {_SPLIT_DUCK} AS split FROM documents),
    sh AS (SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM toks),
    hashed AS (
      SELECT doc_id, s.i AS pos,
             ('0x' || substr(md5(shingle || '#' || CAST(s.i AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) s
    ),
    sig AS (SELECT doc_id, pos, min(h) AS mh FROM hashed GROUP BY doc_id, pos),
    sigarr AS (SELECT doc_id, list(mh ORDER BY pos) AS sig FROM sig GROUP BY doc_id),
    bands AS (
      SELECT doc_id, pos // 2 AS band, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY pos) AS band_key
      FROM sig GROUP BY doc_id, pos // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             round(len(list_filter(generate_series(1, 8), i -> sa.sig[i] = sb.sig[i])) / 8.0, 6) AS est_jaccard
      FROM cand c
      JOIN sigarr sa ON sa.doc_id = c.id_a
      JOIN sigarr sb ON sb.doc_id = c.id_b
    )
    SELECT CASE WHEN ta.split = 'train' THEN s.id_a ELSE s.id_b END AS train_doc,
           CASE WHEN ta.split = 'train' THEN s.id_b ELSE s.id_a END AS test_doc,
           s.est_jaccard
    FROM scored s
    JOIN toks ta ON ta.doc_id = s.id_a
    JOIN toks tb ON tb.doc_id = s.id_b
    WHERE (ta.split = 'train' AND tb.split = 'test')
       OR (ta.split = 'test' AND tb.split = 'train')
    """


@query("cross_split_near_dup_leakage", oracle=_cross_split_leakage_oracle())
def cross_split_near_dup_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate eval-set contamination: MinHash-LSH candidate
    pairs that straddle the train/test split boundary, with estimated
    Jaccard — the stronger sibling of ``ngram_contamination`` (exact
    n-gram overlap misses paraphrased/perturbed leaks; near-dup
    detection at the split boundary is what production decontamination
    actually runs before training).

    Plan: the full-corpus MinHash pipeline runs ONCE (shingle → 8
    md5-derived minhashes → 4 band keys → band-bucket equi-join —
    linear, the same machinery as minhash_lsh_near_dup); the split
    labels are a pure doc_id hash attached by broadcast-size joins on
    the CANDIDATE pairs (tiny), and only train×test pairs survive. At
    100 TB nothing beyond the existing LSH cost is added — the split
    filter is free relative to candidate generation. (r16: bands
    derive map-side from the signature array in minhash_near_dup_pairs;
    this note re-tiers the query into the driver sweep — helper edits
    don't change its source hash.)
    """
    from currency_etl_pipeline_spark.operators.dedup import minhash_near_dup_pairs
    from currency_etl_pipeline_spark.queries.text import shingles

    docs = spread(load_table(spark, sf_dir, "documents"))
    shingled = exploded(
        docs.select("doc_id", shingles().alias("sh")), ["doc_id"], F.col("sh"), "shingle"
    )
    pairs = minhash_near_dup_pairs(shingled, "doc_id", "shingle", num_hashes=8, band_size=2)
    splits = load_table(spark, sf_dir, "documents").select(
        "doc_id", _split_expr().alias("split")
    )
    sa = splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    j = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            ((F.col("split_a") == "train") & (F.col("split_b") == "test"))
            | ((F.col("split_a") == "test") & (F.col("split_b") == "train"))
        )
    )
    return j.select(
        F.when(F.col("split_a") == "train", F.col("id_a")).otherwise(F.col("id_b")).alias("train_doc"),
        F.when(F.col("split_a") == "train", F.col("id_b")).otherwise(F.col("id_a")).alias("test_doc"),
        "est_jaccard",
    )


# Non-overlapping passage width for passage-level dedup: one regex
# match grabs up to 16 whitespace-separated words, scanning
# left-to-right — a single codegen pass per row in BOTH engines (no
# per-element re-tokenization; cf. the shingles() zip_with note).
_PASSAGE_WORDS = 16
# Both engine patterns derive from the ONE width constant — editing the
# width cannot desynchronize the Spark plan from the DuckDB oracle.
_PASSAGE_PAT = r"\S+(?:\s+\S+){0,%d}" % (_PASSAGE_WORDS - 1)
_PASSAGES_DUCK = (
    "regexp_extract_all(trim(coalesce(text, '')), '" + _PASSAGE_PAT + "')"
)


def _passage_dedup_oracle() -> str:
    return f"""
    WITH p AS (
        SELECT doc_id,
               unnest({_PASSAGES_DUCK}) AS passage,
               generate_subscripts({_PASSAGES_DUCK}, 1) - 1 AS pidx
        FROM documents
    ), marked AS (
        SELECT doc_id, pidx, passage,
               row_number() OVER (PARTITION BY passage ORDER BY doc_id, pidx) AS rn
        FROM p
    )
    -- LEFT JOIN from documents: a NULL/empty/whitespace-only doc has no
    -- passages but must still emit a (doc_id, 0, 0, '') row, exactly
    -- like the Spark side's left join.
    SELECT d.doc_id,
           CAST(count(m.passage) AS BIGINT) AS n_passages,
           CAST(count(*) FILTER (WHERE m.rn = 1) AS BIGINT) AS n_kept,
           coalesce(string_agg(m.passage, ' ' ORDER BY m.pidx) FILTER (WHERE m.rn = 1), '')
               AS clean_text
    FROM documents d LEFT JOIN marked m USING (doc_id)
    GROUP BY d.doc_id
    """


def passage_rewrite(docs: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Reusable core of ``passage_dedup_rewrite``: input (doc_id, text
    [, keep_cols...]), output (doc_id, keep_cols..., n_passages,
    n_kept, clean_text). See the query docstring for semantics and the
    one-text-shuffle plan argument."""
    docs = docs.select("doc_id", "text", *keep_cols)
    passages = F.regexp_extract_all(
        F.trim(F.coalesce(F.col("text"), F.lit(""))), F.lit(_PASSAGE_PAT), 0
    )
    keys = (
        spread(docs.select("doc_id", "text"))
        .select("doc_id", F.posexplode_outer(passages).alias("pidx", "p"))
        .filter(F.col("p").isNotNull())
        .select("doc_id", "pidx", F.md5("p").alias("h"))
    )
    winners = keys.groupBy("h").agg(F.min(F.struct("doc_id", "pidx")).alias("w"))
    kept = (
        winners.select(F.col("w.doc_id").alias("doc_id"), F.col("w.pidx").alias("pidx"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pidx")).alias("kept_idx"))
    )
    empty_idx = F.array().cast("array<int>")
    kept_idx = F.coalesce(F.col("kept_idx"), empty_idx)
    return docs.join(kept, "doc_id", "left").select(
        "doc_id",
        *keep_cols,
        F.size(passages).cast("bigint").alias("n_passages"),
        F.size(kept_idx).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(kept_idx, lambda i: F.element_at(passages, i + 1)), " "
        ).alias("clean_text"),
    )


@query("passage_dedup_rewrite", oracle=_passage_dedup_oracle())
def passage_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup that REWRITES documents: split each
    doc into non-overlapping 16-word passages, keep only the globally
    FIRST occurrence of each distinct passage (ordered by doc_id, then
    position), and reassemble the surviving passages in order — the
    sub-document sibling of ``exact_dedup_documents`` (which drops
    whole docs) and the rewrite counterpart of ``doc_repetition_score``
    (which only scores). This is the boilerplate/refrain-removal pass a
    corpus pipeline runs between doc-level dedup and shard packing; the
    fixture corpus carries ~8% naturally duplicated passages (planted
    near-dup docs share chunks), so the rewrite is non-vacuous.

    Plan — text is shuffled ONCE, not twice: the keep/drop decision
    travels as (md5, doc_id, pidx) digests only (a window over the
    passage TEXT would shuffle the corpus by passage and then again by
    doc_id). Winners per digest come from one min(struct) hash-agg on
    the digest (map-side partial, ~40-byte rows); the winning positions
    fold to a per-doc index list (second narrow shuffle); the final
    sort-merge join on doc_id re-derives passages from the original
    text with the same single-pass regex — recompute-over-reshuffle,
    the cheap side of the tradeoff since the regex is scan-bandwidth
    bound while a corpus reshuffle is network bound. Left join +
    coalesce keeps fully-duplicated docs as empty rewrites instead of
    dropping them silently.
    """
    return passage_rewrite(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


# Sub-passage dedup window width (words). Shares the 16-word scale
# with _PASSAGE_WORDS so the two rewrites are directly comparable; the
# provable difference is ALIGNMENT — fixed chunks only match when the
# duplicate starts on a 16-word boundary in both docs, stride-1
# windows match at any offset.
_SUBPASS_W = 16


def _subpassage_oracle(w: int = _SUBPASS_W, gate: bool = False) -> str:
    """DuckDB twin of the sub-passage family. ``gate=False`` (the
    batch rewrite): a hit is any window occurrence after the globally
    first, ranked by (doc_id, widx) — this branch's output is pinned
    byte-identical to the long-green r13 string. ``gate=True`` (the
    streaming admission gate): documents are md5-split; a hit is any
    TEST-doc window whose content occurs anywhere in the TRAIN split's
    window vocabulary, and the report covers test docs only — the
    same islands/rewrite tail on a different hit predicate."""
    if gate:
        head = f"""
    WITH t AS (
        SELECT doc_id, {_SPLIT_DUCK} AS split,
               regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS toks
        FROM documents
    ), w AS (
        SELECT doc_id, split, i - 1 AS widx,
               md5(array_to_string(toks[i:i+{w - 1}], ' ')) AS h
        FROM t, unnest(generate_series(1, greatest(len(toks) - {w - 1}, 0))) AS g(i)
    ), tv AS (
        SELECT DISTINCT h FROM w WHERE split = 'train'
    ), hits AS (
        SELECT w.doc_id, w.widx FROM w JOIN tv USING (h) WHERE w.split = 'test'
    ), isl AS ("""
    else:
        head = f"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS toks
        FROM documents
    ), w AS (
        SELECT doc_id, i - 1 AS widx,
               md5(array_to_string(toks[i:i+{w - 1}], ' ')) AS h
        FROM t, unnest(generate_series(1, greatest(len(toks) - {w - 1}, 0))) AS g(i)
    ), r AS (
        SELECT doc_id, widx,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, widx) AS rn
        FROM w
    ), hits AS (
        SELECT doc_id, widx FROM r WHERE rn > 1
    ), isl AS ("""
    doc_filter = "\n    WHERE t.split = 'test'" if gate else ""
    return head + f"""
        SELECT doc_id, widx,
               CASE WHEN widx <= coalesce(max(widx + {w}) OVER (
                        PARTITION BY doc_id ORDER BY widx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 0 ELSE 1 END AS brk
        FROM hits
    ), sp AS (
        SELECT doc_id, min(widx) AS s, max(widx) + {w} AS e
        FROM (SELECT doc_id, widx,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY widx
                                    ROWS UNBOUNDED PRECEDING) AS island
              FROM isl) z
        GROUP BY doc_id, island
    ), words AS (
        SELECT doc_id, p - 1 AS pos, toks[p] AS wd
        FROM t, unnest(generate_series(1, greatest(len(toks), 0))) AS gg(p)
    ), cov AS (
        SELECT wo.doc_id, wo.pos, wo.wd,
               EXISTS(SELECT 1 FROM sp WHERE sp.doc_id = wo.doc_id
                      AND wo.pos >= sp.s AND wo.pos < sp.e) AS covered
        FROM words wo
    ), agg AS (
        SELECT doc_id,
               coalesce(string_agg(wd, ' ' ORDER BY pos) FILTER (WHERE NOT covered), '')
                   AS clean
        FROM cov GROUP BY doc_id
    ), s2 AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(e - s) AS BIGINT) AS n_removed
        FROM sp GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_words,
           coalesce(s2.n_spans, 0) AS n_dup_spans,
           coalesce(s2.n_removed, 0) AS n_removed_words,
           coalesce(a.clean, '') AS clean_text
    FROM t
    LEFT JOIN s2 ON t.doc_id = s2.doc_id
    LEFT JOIN agg a ON t.doc_id = a.doc_id{doc_filter}
    """


def subpassage_rewrite(docs: DataFrame, w: int = _SUBPASS_W) -> DataFrame:
    """Reusable core of ``subpassage_dedup_rewrite``: input
    (doc_id, text), output (doc_id, n_words, n_dup_spans,
    n_removed_words, clean_text). See the query docstring."""
    docs = docs.select("doc_id", F.trim(F.coalesce(F.col("text"), F.lit(""))).alias("text"))
    # All w-word window IDENTITIES in position order — the r14 rolling
    # upgrade (VERDICT r13 task 3): token_hashes projects each token's
    # hash pair ONCE, then two 31-bit polynomial chains roll over the
    # materialized array, so the scan stage never materializes a
    # window STRING (the old zip_with concat chain transiently carried
    # ~w× the corpus's char volume) and the decision shuffle key is
    # one 8-byte long instead of a 32-char md5 hex. The filtered tail
    # preserves index-is-position, so the posexplode index IS widx.
    kw = (
        spread(docs)
        .select("doc_id", token_hashes().alias("tv"))
        .select(
            "doc_id",
            F.posexplode_outer(rolled_window_hashes(F.col("tv"), w)).alias("widx", "h"),
        )
        .filter(F.col("h").isNotNull())
    )
    rn = F.row_number().over(Window.partitionBy("h").orderBy("doc_id", "widx"))
    hits = kw.withColumn("rn", rn).filter(F.col("rn") > 1).select("doc_id", "widx")

    # Merge overlapping/contiguous hit windows into maximal spans
    # (gaps-and-islands over the running max of window ends).
    w_prev = (
        Window.partitionBy("doc_id").orderBy("widx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("widx") + w).over(w_prev)
    brk = F.when(F.col("widx") <= F.coalesce(prev_end, F.lit(-1)), 0).otherwise(1)
    w_run = (
        Window.partitionBy("doc_id").orderBy("widx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        hits.withColumn("brk", brk)
        .withColumn("island", F.sum("brk").over(w_run))
        .groupBy("doc_id", "island")
        .agg(
            F.min("widx").cast("long").alias("s"),
            (F.max("widx") + w).cast("long").alias("e"),
        )
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("spans"),
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("n_removed_words"),
    )
    return _apply_spans(docs, per_doc)


def _apply_spans(docs: DataFrame, per_doc: DataFrame) -> DataFrame:
    """Shared rewrite tail of the sub-passage family: join the per-doc
    maximal-span lists (doc_id, spans array<struct<s,e>>, n_dup_spans,
    n_removed_words — tiny, broadcast-able) back onto (doc_id, text)
    and drop covered word positions JVM-side. Docs with no spans pass
    through with zero counts and their full text."""
    toks = tokens()
    sp = F.coalesce(F.col("spans"), F.array().cast("array<struct<s:long,e:long>>"))
    covered = lambda i: F.exists(sp, lambda seg: (i >= seg["s"]) & (i < seg["e"]))  # noqa: E731
    marked = F.transform(toks, lambda x, i: F.when(covered(i), F.lit(None)).otherwise(x))
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).alias("n_dup_spans"),
        F.coalesce(F.col("n_removed_words"), F.lit(0)).alias("n_removed_words"),
        F.array_join(F.filter(marked, lambda x: x.isNotNull()), " ").alias("clean_text"),
    )


def merged_spans(hits_sorted: "F.Column", w: int = _SUBPASS_W) -> "F.Column":
    """Gaps-and-islands span merge as a single array fold, for
    contexts where window functions are unavailable (a streaming
    aggregation's post-agg projection): given the SORTED hit window
    positions of one doc, the maximal merged spans
    array<struct<s:long,e:long>>. A hit at widx merges into the last
    span when widx <= last.e (overlap or contiguity — positions are
    ascending, so the last span always carries the running max end),
    else opens a new span; identical semantics to the window-function
    form in subpassage_rewrite, property-pinned against it."""
    empty = F.array().cast("array<struct<s:long,e:long>>")

    def step(acc, x):
        last = F.element_at(acc, -1)
        ext = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last["s"].alias("s"), (x + w).cast("long").alias("e")
                )
            ),
        )
        new = F.concat(
            acc,
            F.array(
                F.struct(x.cast("long").alias("s"), (x + w).cast("long").alias("e"))
            ),
        )
        return F.when((F.size(acc) > 0) & (x <= last["e"]), ext).otherwise(new)

    return F.aggregate(hits_sorted, empty, step)


@query("subpassage_dedup_rewrite", oracle=_subpassage_oracle())
def subpassage_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARBITRARY-boundary duplicated-span removal (r13, VERDICT task
    6) — the published next step past fixed-chunk passage dedup (Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", ExactSubstr): a duplicated run of >= 16 words is removed
    wherever it STARTS, not only when it happens to align with a
    16-word chunk grid, and only its globally first occurrence
    (min (doc_id, position)) survives. ``passage_dedup_rewrite``
    provably misses any duplicate span that starts off-grid in either
    doc (pinned with a planted cross-boundary duplicate in
    tests/test_properties.py); this query catches all of them at the
    16-word threshold.

    Device (suffix arrays don't distribute; this does): stride-1
    16-word window identities per doc (rolled_window_hashes — each
    token xxhash64-ed ONCE, two 31-bit polynomial chains rolled over
    the hash arrays, packed into one long; the r14 upgrade that
    retired the per-window md5-of-concatenated-string, which
    transiently materialized ~w× the corpus's char volume in the scan
    stage — VERDICT r13 task 3) → hashes with their positions → one
    row_number window over the hash marks every occurrence after the
    first as a hit → per-doc gaps-and-islands merge of
    overlapping/contiguous hit windows into maximal spans → the span
    list (tiny per doc) joins back and the rewrite drops covered
    words JVM-side. A duplicated span of length L >= w is exactly the
    union of its L-w+1 duplicated windows, so the merged spans ARE
    the Lee et al. duplicated substrings at threshold w. The DuckDB
    oracle keeps md5-of-window-string — an INDEPENDENT implementation
    of the same window-equality semantics (equal windows always
    collide on both sides; distinct windows collide Spark-side with
    odds ~2^-62 per pair — see rolled_window_hashes for the width
    knob at extreme scale).

    Plan/scale — the one-text-shuffle discipline (plan-pinned in
    tests/test_scale_plans.py): the decision pipeline shuffles hash
    rows only — (doc_id, widx, h), ~24 bytes (was ~48 with md5 hex) —
    once on the hash for first-occurrence ranking and once on doc_id
    for the island merge; the corpus-side rolling work happens in the
    scan stage over long arrays, and the per-doc span lists BROADCAST
    back to the rewrite join, so the only text movement at fixture
    scale is spread()'s pre-expansion repartition (a no-op once input
    splits >= cores). In the no-broadcast sort-merge regime the
    rewrite join degrades to the same single text shuffle
    passage_dedup_rewrite pays. Stride-1 windows cost w multiply-adds
    per word per chain — the price of exactness at the w-word
    threshold (the published suffix-array approach is single-node;
    this is the distributable equivalent); at 100 TB the hash
    relation is bounded and spill-friendly, and w is the knob.

    Non-vacuous organically: 23 fixture docs carry duplicated spans at
    sf0.01 (221 at sf0.1) — the planted near-dup documents share long
    runs at arbitrary offsets."""
    return subpassage_rewrite(load_table(spark, sf_dir, "documents").select("doc_id", "text"))


# Boilerplate = a passage seen in >= _BOILER_MIN_DOCS DISTINCT docs
# (the CCNet/C4 shared-lines criterion, at this corpus's passage
# granularity since the synthetic text has no newlines). 3 is the
# smallest threshold that separates template refrains from the
# pairwise near-dup chunks passage_dedup_rewrite already handles;
# the fixture has 7 (sf0.001) / 15 (sf0.01) such passages, so both
# queries are non-vacuous at every test scale.
_BOILER_MIN_DOCS, _BOILER_TOPK = 3, 30


@query(
    "boilerplate_passage_report",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, unnest({_PASSAGES_DUCK}) AS passage FROM documents
    ), c AS (
        SELECT passage,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM p GROUP BY passage
        HAVING count(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
    )
    SELECT passage, n_docs, n_occurrences, pos FROM (
        SELECT passage, n_docs, n_occurrences,
               row_number() OVER (ORDER BY n_docs DESC, n_occurrences DESC,
                                  passage ASC) AS pos
        FROM c) r
    WHERE pos <= {_BOILER_TOPK}
    """,
)
def boilerplate_passage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide boilerplate detection (the CCNet/C4 shared-lines
    report): the top-30 passages appearing in >= 3 DISTINCT documents,
    with document frequency and total occurrence count — the audit a
    training-data pipeline runs before deciding what
    ``boilerplate_strip_rewrite`` removes (cookie banners, license
    headers, navigation chrome: high doc-frequency, low information).
    Distinct-doc frequency — not raw occurrences — is the criterion;
    a passage repeated 50× inside ONE doc is repetition
    (doc_repetition_score's business), not boilerplate.

    Plan/scale: one corpus scan → non-overlapping 16-word passage
    split (single codegen regex pass, the passage_dedup_rewrite
    device) → ONE hash aggregation keyed by passage computing the
    distinct-doc and occurrence counts together (the distinct rides
    Spark's standard two-phase expand; the shuffle carries the
    passage vocabulary, not the corpus); the HAVING filter drops the
    singleton long tail BEFORE the top-k, so the final row_number
    window orders only the boilerplate survivors (tens of rows at
    any scale — boilerplate is by definition low-cardinality).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    passages = F.regexp_extract_all(
        F.trim(F.coalesce(F.col("text"), F.lit(""))), F.lit(_PASSAGE_PAT), 0
    )
    c = (
        spread(docs)
        .select("doc_id", F.explode(passages).alias("passage"))
        .groupBy("passage")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= _BOILER_MIN_DOCS)
    )
    wk = Window.orderBy(
        F.col("n_docs").desc(), F.col("n_occurrences").desc(), F.col("passage").asc()
    )
    return (
        c.withColumn("pos", F.row_number().over(wk).cast("long"))
        .filter(F.col("pos") <= _BOILER_TOPK)
    )


@query(
    "boilerplate_strip_rewrite",
    oracle=f"""
    WITH p AS (
        SELECT doc_id,
               unnest({_PASSAGES_DUCK}) AS passage,
               generate_subscripts({_PASSAGES_DUCK}, 1) - 1 AS pidx
        FROM documents
    ), freq AS (
        SELECT passage, count(DISTINCT doc_id) AS nd FROM p GROUP BY passage
    ), marked AS (
        SELECT p.doc_id, p.pidx, p.passage, f.nd
        FROM p JOIN freq f USING (passage)
    )
    SELECT d.doc_id,
           CAST(count(m.passage) AS BIGINT) AS n_passages,
           CAST(count(*) FILTER (WHERE m.nd < {_BOILER_MIN_DOCS}) AS BIGINT)
               AS n_kept,
           coalesce(string_agg(m.passage, ' ' ORDER BY m.pidx)
                        FILTER (WHERE m.nd < {_BOILER_MIN_DOCS}), '')
               AS clean_text
    FROM documents d LEFT JOIN marked m USING (doc_id)
    GROUP BY d.doc_id
    """,
)
def boilerplate_strip_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate REMOVAL that rewrites documents: strip EVERY
    occurrence of every passage whose corpus document-frequency is
    >= 3, reassembling the survivors in order. The semantic complement
    of ``passage_dedup_rewrite``: dedup keeps the FIRST occurrence of
    each duplicated passage (near-dup repair), this keeps NONE of the
    high-frequency ones (template chrome carries no training signal —
    the C4/CCNet cleanup). Together they are the standard two-pass
    sub-document hygiene of a corpus pipeline.

    Plan — the passage_rewrite discipline verbatim: text shuffles
    ONCE. Keep/drop decisions travel as (md5, doc_id, pidx) digests;
    the boilerplate digest set is one hash agg on the digest
    (distinct-doc count via the standard two-phase expand) and the
    strip is a LEFT ANTI join of digests against it; surviving
    positions fold to a per-doc index list and the final join on
    doc_id re-derives passage text from the original column with the
    same single-pass regex (recompute-over-reshuffle — regex is scan
    bound, corpus reshuffle is network bound). Left join + coalesce
    keeps all-boilerplate and NULL-text docs as empty rewrites
    instead of dropping them.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    passages = F.regexp_extract_all(
        F.trim(F.coalesce(F.col("text"), F.lit(""))), F.lit(_PASSAGE_PAT), 0
    )
    # The digest relation feeds TWO consumers (the frequency agg and
    # the anti-join); localCheckpoint it once or the whole scan +
    # regex subtree is planned per consumer (3 corpus scans instead
    # of 2 — caught by the executed-plan audit). ~40 B/passage, a
    # fraction of the text it summarizes; the hybrid_rrf/edge-list
    # precedent.
    keys = (
        spread(docs.select("doc_id", "text"))
        .select("doc_id", F.posexplode_outer(passages).alias("pidx", "p"))
        .filter(F.col("p").isNotNull())
        .select("doc_id", "pidx", F.md5("p").alias("h"))
        .localCheckpoint(eager=True)
    )
    boiler = (
        keys.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= _BOILER_MIN_DOCS)
        .select("h")
    )
    kept = (
        keys.join(boiler, "h", "left_anti")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pidx")).alias("kept_idx"))
    )
    empty_idx = F.array().cast("array<int>")
    kept_idx = F.coalesce(F.col("kept_idx"), empty_idx)
    return docs.join(kept, "doc_id", "left").select(
        "doc_id",
        F.size(passages).cast("bigint").alias("n_passages"),
        F.size(kept_idx).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(kept_idx, lambda i: F.element_at(passages, i + 1)), " "
        ).alias("clean_text"),
    )


# Unigram-LM vocabulary cap. 20 covers ~2/3 of the fixture's 31-token
# vocabulary so the OOV bucket is genuinely exercised; at corpus scale
# the cap (top-100k + OOV) is what keeps the LM broadcast-size.
_LM_VOCAB = 20

# Fixed-point resolution for the per-term NLL contributions. A doc's
# quantized log-prob sum must fit BIGINT: |sum(fp)| ≤ R·|ln p_min|·
# n_doc_tokens with |ln p_min| = ln(corpus tokens) ≈ 35 at 100 TB, so
# R = 1e9 bounds the safe single-document size at ~2.6e8 tokens
# (> 1 GB of text — no real document; anything larger is degenerate
# and rejected upstream by the length gates). The previous 1e12
# overflowed at ~2.6e5 tokens/doc — a perfectly real document size.
# Both engines quantize with the SAME R, so parity is exact at any R;
# the residual quantization error on mean NLL is < 1e-9 nats.
_NLL_FP = 1_000_000_000


def _perplexity_oracle() -> str:
    return f"""
    WITH ex AS (
        SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term
    ), cnt AS (
        SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY term
    ), tot AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnt
    ), vocab AS (
        SELECT term, cnt FROM cnt ORDER BY cnt DESC, term ASC LIMIT {_LM_VOCAB}
    ), oov AS (
        SELECT (SELECT total FROM tot) - CAST(sum(cnt) AS BIGINT) AS oov_cnt FROM vocab
    ), contrib AS (
        SELECT tf.doc_id, tf.tf,
               CAST(floor(tf.tf * ln(coalesce(v.cnt, o.oov_cnt) * 1.0 / t.total) * {_NLL_FP})
                    AS BIGINT) AS fp,
               CASE WHEN v.term IS NULL THEN tf.tf ELSE 0 END AS oov_toks
        FROM tf LEFT JOIN vocab v USING (term)
        CROSS JOIN tot t CROSS JOIN oov o
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(oov_toks) AS BIGINT) AS n_oov,
           round(-(sum(fp) / {_NLL_FP}.0) / sum(tf), 6) AS nll,
           (-(sum(fp) / {_NLL_FP}.0) / sum(tf)) <= 2.66 AS keep
    FROM contrib GROUP BY doc_id
    """


def unigram_nll(docs: DataFrame, vocab_cap: int = _LM_VOCAB) -> DataFrame:
    """Reusable core of ``perplexity_quality_score``: fit the
    top-``vocab_cap``+OOV unigram LM on ``docs`` (doc_id, text) and
    return (doc_id, n_tokens, n_oov, nll_exact) — nll_exact is the
    UNROUNDED fixed-point mean NLL, so callers choose their own
    rounding/threshold. See the query docstring for the plan and
    determinism argument."""
    docs = spread(docs.select("doc_id", "text"))
    ex = exploded(docs, ["doc_id"], tokens(), "term")
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cnt = tf.groupBy("term").agg(F.sum("tf").cast("bigint").alias("cnt"))
    tot = cnt.agg(F.sum("cnt").cast("bigint").alias("total"))
    vocab = cnt.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(vocab_cap)
    oov = vocab.agg(F.sum("cnt").cast("bigint").alias("in_vocab_cnt")).crossJoin(
        F.broadcast(tot)
    ).select((F.col("total") - F.col("in_vocab_cnt")).alias("oov_cnt"))
    p = F.coalesce(F.col("cnt"), F.col("oov_cnt")) * 1.0 / F.col("total")
    contrib = (
        tf.join(F.broadcast(vocab), "term", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(oov))
        .select(
            "doc_id",
            "tf",
            F.floor(F.col("tf") * F.log(p) * F.lit(float(_NLL_FP))).cast("bigint").alias("fp"),
            F.when(F.col("cnt").isNull(), F.col("tf")).otherwise(F.lit(0)).alias("oov_toks"),
        )
    )
    nll = -(F.sum("fp") / F.lit(float(_NLL_FP))) / F.sum("tf")
    return contrib.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.sum("oov_toks").cast("bigint").alias("n_oov"),
        nll.alias("nll_exact"),
    )


@query("perplexity_quality_score", oracle=_perplexity_oracle())
def perplexity_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity filter (the CCNet-style quality gate,
    public literature): fit token probabilities on the corpus itself —
    top-20 vocabulary + a single OOV bucket — and score every document
    by mean negative log-likelihood; low-NLL docs look like the corpus,
    high-NLL docs are outliers (gibberish, wrong language, boilerplate).
    The keep flag applies a fixed 2.66-nat threshold (the fixture
    corpus median NLL; uniform 31-token entropy would be ln 31 ≈ 3.43
    but the skewed tf mass pulls typical docs lower), so both kept and
    dropped documents exist at every fixture scale — a production run
    would calibrate this cut on a held-out slice exactly the same way.

    Scale design: the LM is bounded by construction — top-V selection
    runs as TakeOrderedAndProject (distributed heap-merge, never a
    global sort) and broadcasts V+2 narrow rows; scoring is one
    broadcast left join on the (doc_id, term) tf table. Per-doc
    aggregation of log-probs must be partition-order-independent, so
    each contribution is quantized to 1e-9 fixed-point BIGINT (see
    _NLL_FP's overflow bound: safe to ~2.6e8 tokens per document)
    (floor-toward--inf in both engines) and summed exactly — the same
    discipline as the DECIMAL sums (functions/scalars.dec), chosen here
    because ln outputs are arbitrary doubles, and floor-quantization
    has no round-half tie ambiguity across engines.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nll = unigram_nll(docs)
    return nll.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.round(F.col("nll_exact"), 6).alias("nll"),
        (F.col("nll_exact") <= 2.66).alias("keep"),
    )


# Retrieval chunking: 16-token windows advancing by 12 (4-token
# overlap) — overlap preserves context across chunk boundaries, the
# standard RAG indexing prep. Distinct from _PASSAGE_PAT's
# non-overlapping chunks (dedup wants a partition, retrieval wants
# overlap).
_CHUNK_WIDTH = 16
_CHUNK_STRIDE = 12


def _chunk_oracle() -> str:
    return f"""
    WITH t AS (
        SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents
    ), idx AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, CAST(floor((len(toks) - 1) / {_CHUNK_STRIDE}.0) AS BIGINT))) AS chunk_id
        FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * {_CHUNK_STRIDE} AS BIGINT) AS start_tok,
           CAST(len(toks[chunk_id * {_CHUNK_STRIDE} + 1 : chunk_id * {_CHUNK_STRIDE} + {_CHUNK_WIDTH}]) AS BIGINT) AS n_tokens,
           array_to_string(toks[chunk_id * {_CHUNK_STRIDE} + 1 : chunk_id * {_CHUNK_STRIDE} + {_CHUNK_WIDTH}], ' ') AS chunk_text
    FROM idx
    """


@query("doc_chunk_windows", oracle=_chunk_oracle())
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking for retrieval indexing: each doc
    becomes ceil(n/stride)-ish chunks of up to 16 tokens advancing by
    12 (4-token overlap), with token offsets — the doc → chunk →
    embed → ANN-index prep stage (the chunks would feed
    ``embedding_l2_normalize`` + the ANN family).

    Plan: map-only — tokenize once per row, posexplode the chunk-index
    range, slice per chunk row; no shuffle at all, so the stage
    pipelines into whatever embeds/writes the chunks downstream. The
    chunk count per doc is derived arithmetically from the token count
    (never a while-loop), and empty docs yield no chunks in both
    engines.
    """
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = tokens()
    n = F.size(toks)
    # chunk ids 0..floor((n-1)/stride); guard n=0 with an empty range.
    ids = F.when(
        n > 0,
        F.sequence(F.lit(0).cast("long"), F.floor((n - 1) / F.lit(_CHUNK_STRIDE))),
    ).otherwise(F.array().cast("array<long>"))
    ex = exploded(docs.select("doc_id", toks.alias("toks"), ids.alias("ids")),
                  ["doc_id", "toks"], F.col("ids"), "chunk_id")
    start = F.col("chunk_id") * _CHUNK_STRIDE
    chunk = F.slice(F.col("toks"), start + 1, _CHUNK_WIDTH)
    # No boundary filter needed: ids run 0..floor((n-1)/stride), so the
    # max start is <= n-1 < n by construction (same bound in the oracle).
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("start_tok"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# Systematic PPS geometry: k selections over the weight line; block
# width for the two-level prefix sum (the packed_docs device).
_PPS_K, _PPS_BLOCK = 50, 64


@query(
    "pps_systematic_sample",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, n_chars AS w FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    p AS (
        SELECT doc_id, w,
               COALESCE(sum(w) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS s,
               sum(w) OVER () AS tot
        FROM d
    )
    SELECT doc_id, CAST(w AS BIGINT) AS n_chars,
           CAST(s AS BIGINT) AS pos_start,
           CAST(({_PPS_K} * (s + w)) // tot
                - ({_PPS_K} * s) // tot AS BIGINT) AS multiplicity
    FROM p
    WHERE ({_PPS_K} * (s + w)) // tot - ({_PPS_K} * s) // tot >= 1
    """,
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sample of the
    corpus, weight = n_chars — the deterministic, one-pass sampler a
    training-data pipeline uses for eval slices and mixture audits
    (domain_temperature_resample reweights DOMAINS by quota; this
    draws k DOCUMENT selections with P ∝ size, long docs eligible for
    multiplicity ≥ 2 — the Lahiri/systematic-sampling classic).
    Selection rule: lay every document's weight on a line in doc_id
    order; a document whose span [s, s+w) crosses a multiple of W/k
    is selected, multiplicity = ⌊k(s+w)/W⌋ − ⌊ks/W⌋, so exactly k
    selections total, all integer arithmetic (floor-div on BIGINTs —
    no RNG, no floats, reproducible across engines, partitionings,
    and reruns; the no-libm/fixed-point house discipline).

    Plan/scale: the exclusive prefix sum s is the TWO-LEVEL
    distributed prefix sum at scale (block-local window + broadcast
    block offsets — packed_docs' device and cap argument, shuffling
    only (doc_id, long) pairs); this catalog form runs the oracle's
    identical single-window shape since the offsets table is what the
    driver compares. Σw re-aggregates the block sums; the plan repeats
    the 2-column pushed-filter parquet scan for the block-sum and
    total legs (cheap, columnar) — what the device bounds is SHUFFLE
    volume, (block, long) offset pairs, never corpus rows. Output is
    ≤ k + (docs spanning a threshold) rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.select("doc_id", F.col("n_chars").alias("w"))
        .filter(F.col("w").isNotNull() & (F.col("w") > 0))
        .withColumn("block", F.expr(f"doc_id DIV {_PPS_BLOCK}"))
        .repartition("block")
    )
    w_local = (
        Window.partitionBy("block")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "local_before", F.coalesce(F.sum("w").over(w_local), F.lit(0))
    )
    block_sums = base.groupBy("block").agg(F.sum("w").alias("bw"))
    w_block = Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    offsets = block_sums.select(
        "block", F.coalesce(F.sum("bw").over(w_block), F.lit(0)).alias("off")
    )
    total = block_sums.agg(F.sum("bw").alias("tot"))
    p = (
        local.join(F.broadcast(offsets), "block")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "w",
            (F.col("off") + F.col("local_before")).alias("s"),
            "tot",
        )
    )
    mult = F.expr(
        f"({_PPS_K} * (s + w)) DIV tot - ({_PPS_K} * s) DIV tot"
    )
    return (
        p.withColumn("multiplicity", mult.cast("long"))
        .filter(F.col("multiplicity") >= 1)
        .select(
            "doc_id",
            F.col("w").cast("long").alias("n_chars"),
            F.col("s").cast("long").alias("pos_start"),
            "multiplicity",
        )
    )


# Neyman-allocation sample size (matches the PPS family's eval-slice
# scale; strata are the 20 sources).
_NEYMAN_K = 200


@query(
    "stratified_neyman_sample",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS HUGEINT) AS sx,
               CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sxx
        FROM documents WHERE n_chars IS NOT NULL
        GROUP BY source
    ), w AS (
        SELECT source, n_docs,
               CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)) * 1000000)
                    AS BIGINT) AS wq
        FROM s
    ), t AS (
        SELECT CAST(sum(wq) AS BIGINT) AS tot FROM w
    ), base AS (
        SELECT source, n_docs, wq,
               ({_NEYMAN_K} * wq) // tot AS base_alloc,
               ({_NEYMAN_K} * wq) % tot AS rem
        FROM w, t
    ), extra AS (
        SELECT CAST({_NEYMAN_K} - sum(base_alloc) AS BIGINT) AS n_extra FROM base
    ), alloc AS (
        SELECT source, n_docs,
               CAST(least(base_alloc + CASE WHEN
                          row_number() OVER (ORDER BY rem DESC, source ASC)
                          <= n_extra THEN 1 ELSE 0 END, n_docs) AS BIGINT) AS alloc
        FROM base, extra
    ), ranked AS (
        SELECT d.source, d.doc_id, a.alloc,
               row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS pick
        FROM documents d JOIN alloc a ON a.source = d.source
        WHERE d.n_chars IS NOT NULL
    )
    SELECT source, doc_id, alloc, CAST(pick AS BIGINT) AS pick
    FROM ranked WHERE pick <= alloc
    """,
)
def stratified_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample with Neyman allocation — k = 200 documents
    split across source strata ∝ N_h·S_h (stratum size × n_chars
    stddev), the textbook minimum-variance allocation for estimating a
    corpus mean: variable strata deserve more probes than uniform ones
    of equal size. This is the DESIGNED eval slice beside
    pps_systematic_sample's size-proportional draw and
    domain_temperature_resample's quota reweighting.

    Determinism device, end to end: N_h·S_h collapses algebraically to
    sqrt(n·Σx² − (Σx)²) — the co-moment partials are exact
    HUGEINT/DECIMAL, so the weight is ONE sqrt of an identical integer
    (sqrt IS cross-libm identical, pow(x,.5) is not — FIXTURES), then
    floor-quantized at 1e6 to a BIGINT. Seats are assigned by exact
    integer LARGEST-REMAINDER apportionment: base_h = ⌊k·wq_h/Σwq⌋,
    the Σbase..k shortfall goes to the biggest remainders (source
    tie-break) — floor-div/mod arithmetic both engines replay
    identically, no RNG. Within a stratum the alloc_h picks are the
    first doc_ids (arrival order — a deterministic eval slice, not an
    unbiased estimator; swap the pick ordering for a hash of doc_id to
    de-correlate from arrival without losing reproducibility).
    Degenerate strata are honest: alloc is capped at N_h and the
    shortfall is NOT redistributed (a fixture never hits it; the cap
    keeps the query total-correct on pathological skew).

    Plan/scale: ONE corpus scan → per-source co-moment hash agg (20
    rows); ALL allocation arithmetic happens on that metadata-sized
    table (the single-partition windows there order 20 rows, not the
    corpus). The pick step is one row_number window partitioned BY
    source over the corpus — the same one-exchange shape every
    per-group top-k in this catalog uses — with the 20-row alloc table
    broadcast onto it.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars").isNotNull())
    d38 = "decimal(38,0)"
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("n_chars").cast(d38)).alias("sx"),
        F.sum(F.col("n_chars").cast(d38) * F.col("n_chars").cast(d38)).alias("sxx"),
    )
    w = s.select(
        "source",
        "n_docs",
        F.floor(
            F.sqrt(
                (F.col("n_docs").cast(d38) * F.col("sxx") - F.col("sx") * F.col("sx"))
                .cast("double")
            )
            * 1_000_000
        ).cast("long").alias("wq"),
    )
    t = w.agg(F.sum("wq").cast("long").alias("tot"))
    base = w.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.expr(f"({_NEYMAN_K} * wq) DIV tot").alias("base_alloc"),
        F.expr(f"({_NEYMAN_K} * wq) % tot").alias("rem"),
    )
    extra = base.agg(
        (F.lit(_NEYMAN_K) - F.sum("base_alloc")).cast("long").alias("n_extra")
    )
    wr = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    alloc = (
        base.crossJoin(F.broadcast(extra))
        .withColumn("rn", F.row_number().over(wr))
        .select(
            "source",
            F.least(
                F.col("base_alloc")
                + F.when(F.col("rn") <= F.col("n_extra"), 1).otherwise(0),
                F.col("n_docs"),
            ).cast("long").alias("alloc"),
        )
    )
    wp = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.join(F.broadcast(alloc), "source")
        .withColumn("pick", F.row_number().over(wp).cast("long"))
        .filter(F.col("pick") <= F.col("alloc"))
        .select("source", "doc_id", "alloc", "pick")
    )


@query(
    "bpe_merge_topk",
    oracle=f"""
    WITH w AS (
        SELECT unnest({_TOKS_DUCK}) AS word
        FROM documents WHERE text IS NOT NULL
    ), vocab AS (
        SELECT word, CAST(count(*) AS BIGINT) AS wf
        FROM w WHERE word <> '' GROUP BY word
    ), pairs AS (
        SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                      i -> substring(word, CAST(i AS INTEGER), 2))) AS pair, wf
        FROM vocab WHERE length(word) >= 2
    )
    SELECT pair, CAST(sum(wf) AS BIGINT) AS merge_count
    FROM pairs GROUP BY pair
    ORDER BY merge_count DESC, pair LIMIT 20
    """,
)
def bpe_merge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE training iteration at corpus scale: the top-20
    adjacent character pairs by corpus frequency — each word's count
    weights every one of its intra-word character bigrams, which is
    exactly the merge-candidate score byte-pair-encoding maximizes
    (Sennrich et al. 2016). bpe_token_estimate APPLIES a
    tokenizer-shaped regex; this is the statistic you TRAIN one from,
    run distributed because a 100 TB corpus's word histogram is the
    only pass that touches the data — every later merge iteration
    reruns on the (tiny) weighted vocabulary alone.

    Plan/scale: corpus pass #1 is a map-side-combined word count (the
    classic first shuffle, narrow word/count rows); the character-pair
    explosion then runs on the VOCABULARY (distinct words), not the
    corpus — the BPE trick that makes iteration cheap — feeding a
    second small agg and a TakeOrderedAndProject top-k (per-partition
    heaps, no global sort). All integers; ties at the cut break on the
    pair string in both engines.
    """
    docs = spread(load_table(spark, sf_dir, "documents").select("text")).filter(
        F.col("text").isNotNull()
    )
    words = exploded(docs, [], tokens(), "word").filter(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("wf"))
    pair_arr = F.expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"
    )
    pairs = vocab.filter(F.length("word") >= 2).select(
        "wf", F.explode(pair_arr).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").cast("long").alias("merge_count"))
        .orderBy(F.desc("merge_count"), F.asc("pair"))
        .limit(20)
    )


# Number of unrolled BPE merge rounds for the learn loop. Small and
# fixed: each round is vocabulary-sized (never corpus-sized), and the
# DuckDB twin unrolls the same rounds as chained MATERIALIZED CTEs —
# the near_dup_pagerank precedent for iterative-algorithm oracles.
_BPE_ITERS = 8


def _bpe_seq0() -> "F.Column":
    """A word's initial symbol sequence as a DOUBLE-SPACE-joined string
    with single-space sentinels: ' h  e  l  l  o '. Each symbol is
    flanked by two spaces it shares with no neighbor, so replacing
    ' a  b ' with ' ab ' merges every non-overlapping (a, b) occurrence
    left to right — plain string replace IS the BPE merge step, in both
    engines, with correct greedy semantics on overlaps ('a a a' merges
    once) and on back-to-back matches ('a b a b' merges twice). Words
    come from a whitespace tokenizer, so no symbol can contain a space."""
    chars = F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    return F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))


def _bpe_syms(col: str = "seq") -> "F.Column":
    return F.split(F.trim(F.col(col)), "  ")


def _bpe_learn(
    spark: SparkSession, sf_dir: str, iters: int = _BPE_ITERS, docs: DataFrame | None = None
):
    """Run ``iters`` BPE merge rounds (Sennrich et al. 2016) over the
    corpus word histogram; returns (merge rows, final vocab DataFrame).
    ``docs`` overrides the corpus relation (needs doc_id/text — the
    shard pipeline trains on its CLEANED corpus, not the raw table).

    Round structure: ONE corpus pass builds the weighted vocabulary
    (word, wf, seq); every round after that is vocabulary-sized — count
    adjacent symbol pairs weighted by wf, pick the arg-max (ties break
    on the pair strings, both engines), rewrite every word's seq with
    one string replace. The vocab histogram is localCheckpointed ONCE
    (bounded: distinct words — the corpus is never rescanned); the
    replaces STACK as column expressions over it instead of
    re-materializing per round, so round k evaluates k codegen'd
    replaces over vocab rows (k²/2 total, still vocabulary-sized) —
    cheaper than k checkpoint write jobs. The winning pair is collected
    per round (1 row — bounded) and applied via F.replace with literal
    Columns, so document text can never inject into SQL."""
    if docs is None:
        docs = spread(load_table(spark, sf_dir, "documents"))
    corpus = docs.select("text").filter(F.col("text").isNotNull())
    words = exploded(corpus, [], tokens(), "word").filter(F.col("word") != "")
    vocab0 = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
        .select("word", "wf", _bpe_seq0().alias("seq"))
        .localCheckpoint(eager=True)
    )
    seq_expr = F.col("seq")
    merges: list[tuple] = []
    for it in range(1, iters + 1):
        syms_expr = F.split(F.trim(seq_expr), "  ")
        s = vocab0.select("wf", syms_expr.alias("syms")).filter(F.size("syms") >= 2)
        # zip_with over shifted slices (the shingles() discipline): the
        # syms array is evaluated once per row, not once per element.
        pa_arr = F.slice(F.col("syms"), 1, F.size("syms") - 1)
        pb_arr = F.slice(F.col("syms"), 2, F.size("syms") - 1)
        pairs = s.select(
            "wf",
            F.explode(
                F.zip_with(pa_arr, pb_arr, lambda x, y: F.struct(x.alias("pa"), y.alias("pb")))
            ).alias("p"),
        ).select("wf", "p.pa", "p.pb")
        top = (
            pairs.groupBy("pa", "pb")
            .agg(F.sum("wf").cast("long").alias("c"))
            .orderBy(F.desc("c"), F.asc("pa"), F.asc("pb"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pa, pb, c = top[0]["pa"], top[0]["pb"], top[0]["c"]
        merges.append((it, pa, pb, pa + pb, c))
        seq_expr = F.replace(seq_expr, F.lit(f" {pa}  {pb} "), F.lit(f" {pa}{pb} "))
    return merges, vocab0.select("word", "wf", seq_expr.alias("seq"))


def _bpe_chain_cte(iters: int = _BPE_ITERS) -> str:
    """The DuckDB twin of ``_bpe_learn`` as a chained-CTE prefix:
    v0 (corpus word histogram + initial seqs) then per round k the
    pair counts p{k}, the arg-max m{k}, and the merged vocab v{k}.
    Every CTE is MATERIALIZED — v{k-1} is referenced twice per round
    (by p{k} and v{k}), and DuckDB inlines plain CTEs, which re-runs
    the whole chain exponentially (the embedding_dedup_clusters /
    sequential_dedup_admission lesson). m{k} LEFT JOIN ON TRUE keeps
    the chain alive if a round ever has no pairs (degenerate corpora)."""
    parts = [
        f"""w AS (SELECT unnest({_TOKS_DUCK}) AS word
           FROM documents WHERE text IS NOT NULL),
    v0 AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS wf,
               ' ' || array_to_string(
                   list_transform(generate_series(1, length(word)),
                                  i -> substring(word, CAST(i AS INTEGER), 1)),
                   '  ') || ' ' AS seq
        FROM w WHERE word <> '' GROUP BY word
    )"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
    p{k} AS MATERIALIZED (
        SELECT syms[i] AS pa, syms[i + 1] AS pb, CAST(sum(wf) AS BIGINT) AS c
        FROM (SELECT wf, string_split(trim(seq), '  ') AS syms FROM v{k - 1}),
             unnest(generate_series(1, len(syms) - 1)) AS u(i)
        GROUP BY 1, 2
    ),
    m{k} AS MATERIALIZED (SELECT pa, pb, c FROM p{k} ORDER BY c DESC, pa, pb LIMIT 1),
    v{k} AS MATERIALIZED (
        SELECT word, wf,
               CASE WHEN m.pa IS NULL THEN seq
                    ELSE replace(seq, ' ' || m.pa || '  ' || m.pb || ' ',
                                 ' ' || m.pa || m.pb || ' ') END AS seq
        FROM v{k - 1} LEFT JOIN m{k} m ON TRUE
    )"""
        )
    return "WITH " + "".join(parts)


def _bpe_encode_cte(iters: int = _BPE_ITERS) -> str:
    """The shared encode chain appended to ``_bpe_chain_cte`` by both
    bpe_apply_encode and shard_token_id_streams: final symbol table →
    rank-assigned ids → per-word id arrays → positional corpus
    explode. ONE definition so an encoding change (tie-break, id
    assignment) can never desync the two oracles — the drift class
    _bpe_chain_cte exists to prevent."""
    return f"""
    fs AS MATERIALIZED (
        SELECT word, string_split(trim(seq), '  ') AS syms FROM v{iters}
    ),
    sym_ids AS MATERIALIZED (
        SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS BIGINT) AS tid
        FROM (SELECT DISTINCT unnest(syms) AS sym FROM fs)
    ),
    word_ids AS MATERIALIZED (
        SELECT word, list(tid ORDER BY j) AS ids
        FROM (SELECT word, syms[j] AS sym, j
              FROM fs, unnest(generate_series(1, len(syms))) AS u(j)) t
        JOIN sym_ids USING (sym)
        GROUP BY word
    ),
    doc_words AS (
        SELECT doc_id, ws[j] AS word, j AS wpos
        FROM (SELECT doc_id, {_TOKS_DUCK} AS ws
              FROM documents WHERE text IS NOT NULL) d,
             unnest(generate_series(1, len(ws))) AS u(j)
        WHERE ws[j] <> ''
    )"""


_BPE_MERGES_SELECT = " UNION ALL ".join(
    f"SELECT CAST({k} AS BIGINT) AS iter, pa AS pair_a, pb AS pair_b, "
    f"pa || pb AS merged, c AS merge_count FROM m{k}"
    for k in range(1, _BPE_ITERS + 1)
)


@query(
    "bpe_merge_iterations",
    oracle=f"""
    {_bpe_chain_cte()}
    {_BPE_MERGES_SELECT}
    """,
)
def bpe_merge_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BPE training loop, _BPE_ITERS (8) merge rounds:
    bpe_merge_topk computes round 1's statistic; this runs the actual
    iteration — arg-max pair, merge it into every word's symbol
    sequence, recount — and returns the learned merge table
    (iter, pair_a, pair_b, merged, merge_count), i.e. the tokenizer.

    Plan/scale (the BPE trick, distributed): the corpus is touched
    ONCE (word histogram — the only corpus-sized shuffle); every merge
    round is vocabulary-sized, runs on the checkpointed vocab relation,
    and the per-round reduction to the driver is exactly one row. The
    merge step itself is a single string replace over the
    double-space-delimited symbol sequence (see _bpe_seq0: plain
    replace has exactly BPE's greedy left-to-right semantics), so the
    loop is whole-stage-codegen'd JVM work end to end. The DuckDB twin
    unrolls the same rounds as chained MATERIALIZED CTEs and must
    reproduce every round's winner bit-for-bit — integer counts,
    string tie-breaks."""
    merges, _ = _bpe_learn(spark, sf_dir)
    return spark.createDataFrame(
        merges, "iter long, pair_a string, pair_b string, merged string, merge_count long"
    )


def bpe_encode_docs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """APPLY the learned BPE tokenizer: every document encoded to its
    token-ID array (doc_id, token_ids, n_bpe_tokens, n_words). Token
    ids are the rank of the final symbol string (deterministic — no
    hash, no RNG), assigned from the post-merge symbol inventory.
    This is the API surface (run_training_data_pipeline /
    shard_token_id_streams consume the id arrays); the registered
    ``bpe_apply_encode`` query wraps it with a scalar digest of the
    array because the driver's pandas canonicalizer cannot hash
    list-valued cells (CORRECTNESS_r11 err).

    ``docs`` overrides the corpus (doc_id/text), bpe_token_counts'
    contract: the shard pipeline passes its CLEANED relation so the
    tokenizer trains on — and the ids encode — the text the dataloader
    actually consumes. A word missing from the vocabulary is impossible
    by construction (the same relation trains and encodes).

    Plan/scale — encode the VOCABULARY, not the corpus: the learned
    merges rewrite the distinct-word table (_BPE_ITERS string
    replaces over vocab rows); the symbol inventory is BOUNDED
    (≤ alphabet + _BPE_ITERS merged symbols), so the id dim
    broadcasts; each word's id array is assembled once per DISTINCT
    word. The corpus pass is then one positional explode joined to the
    vocab's id arrays on the word string and re-assembled in document
    order — text shuffles once as (word, pos) pairs, never as full
    documents. This is what feeds sequence_packing real tokenizer
    budgets instead of whitespace counts
    (run_training_data_pipeline(bpe_tokens=True))."""
    _, vocab = _bpe_learn(spark, sf_dir, docs=docs)
    fs = vocab.select("word", _bpe_syms().alias("syms"))
    sym_ids = (
        fs.select(F.explode("syms").alias("sym"))
        .distinct()
        .withColumn(
            "tid", F.row_number().over(Window.orderBy("sym")).cast("long")
        )
    )
    wexp = fs.select("word", F.posexplode("syms").alias("j", "sym"))
    word_ids = (
        wexp.join(F.broadcast(sym_ids), "sym")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "tid"))), lambda x: x["tid"]
            ).alias("ids")
        )
    )
    if docs is None:
        docs = spread(load_table(spark, sf_dir, "documents"))
    corpus = docs.select("doc_id", "text").filter(F.col("text").isNotNull())
    dw = corpus.select(
        "doc_id", F.posexplode_outer(tokens()).alias("wpos", "word")
    ).filter(F.col("word").isNotNull() & (F.col("word") != ""))
    return (
        dw.join(word_ids, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "ids"))),
                    lambda x: x["ids"],
                )
            ).alias("token_ids"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
        .select(
            "doc_id",
            "token_ids",
            F.size("token_ids").cast("long").alias("n_bpe_tokens"),
            "n_words",
        )
    )


@query(
    "bpe_apply_encode",
    oracle=f"""
    {_bpe_chain_cte()},
    {_bpe_encode_cte()}
    SELECT dw.doc_id,
           md5(array_to_string(flatten(list(wi.ids ORDER BY dw.wpos)), ','))
               AS token_ids_md5,
           CAST(sum(len(wi.ids)) AS BIGINT) AS n_bpe_tokens,
           CAST(count(*) AS BIGINT) AS n_words
    FROM doc_words dw JOIN word_ids wi USING (word)
    GROUP BY dw.doc_id
    """,
)
def bpe_apply_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver-checked face of bpe_encode_docs: same per-document
    encoding, but the id array is reduced to md5(array_join(ids, ','))
    — a SCALAR digest that pins element values AND order — because the
    driver's oracle harness canonicalizes results through pandas
    sort_values, which factorizes every column and dies on list cells
    (``unhashable type: 'list'``, CORRECTNESS_r11). The digest is
    exactly as discriminating as the array for equality checking;
    callers who need the ids use bpe_encode_docs."""
    enc = bpe_encode_docs(spark, sf_dir)
    return enc.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.transform("token_ids", lambda x: x.cast("string")), ","
            )
        ).alias("token_ids_md5"),
        "n_bpe_tokens",
        "n_words",
    )


@query(
    "shard_token_id_streams",
    oracle=f"""
    {_bpe_chain_cte()},
    {_bpe_encode_cte()},
    enc AS MATERIALIZED (
        SELECT dw.doc_id,
               flatten(list(wi.ids ORDER BY dw.wpos)) AS ids,
               CAST(sum(len(wi.ids)) AS BIGINT) AS n_tok
        FROM doc_words dw JOIN word_ids wi USING (word)
        GROUP BY dw.doc_id
    ),
    c AS (
        SELECT e.doc_id, d.lang, e.ids, e.n_tok,
               CAST(floor(CAST(coalesce(sum(e.n_tok) OVER (
                   PARTITION BY d.lang ORDER BY e.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) / {PACK_BUDGET}.0) AS BIGINT) AS shard_id
        FROM enc e JOIN documents d USING (doc_id)
    )
    SELECT lang, shard_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           md5(array_to_string(flatten(list(ids ORDER BY doc_id)), ','))
               AS stream_md5
    FROM c GROUP BY lang, shard_id
    """,
)
def shard_token_id_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LEARNED-tokenizer twin of shard_token_streams (VERDICT r11
    task 6): per (lang, shard), the ordered stream of BPE token IDS a
    training dataloader actually consumes — budgets metered in learned
    tokens (packed_docs(token_count=n_bpe_tokens)), content pinned as
    md5 of the comma-joined id stream in doc order. shard_token_streams
    pins the whitespace-token TEXT stream and the grouped-map surface;
    this pins the id stream with the declarative form (collect_list
    ORDER BY device, whole-stage codegen — the preferred shape when no
    imperative per-group work is needed).

    Plan/scale: the encoded corpus (bpe_encode_docs — one corpus pass)
    is localCheckpointed because TWO consumers need it: the packer
    (longs only: doc_id, lang, n_bpe_tokens shuffle through the
    two-level prefix sum — the id arrays never enter the window
    machinery) and the stream concat (one groupBy shuffle of the id
    arrays, unavoidable: that shuffle IS the shard assembly). Without
    the pin, join-key constraint inference re-plans the whole
    encode subtree per branch (the near_dup_jaccard_pairs lesson). In
    production the encoded corpus is a landed artifact (the pipeline
    writes it with the shards), making the checkpoint a parquet read.

    Docs with no encodable words (null/empty text) have no id stream
    and are excluded by construction in both engines."""
    enc = bpe_encode_docs(spark, sf_dir).localCheckpoint()
    langs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "lang")
    with_lang = enc.join(langs, "doc_id")
    packed = packed_docs(with_lang, token_count=F.col("n_bpe_tokens"))
    return (
        packed.join(enc.select("doc_id", "token_ids"), "doc_id")
        .groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.md5(
                F.array_join(
                    F.flatten(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("doc_id", "token_ids"))
                            ),
                            lambda x: x["token_ids"],
                        )
                    ).cast("array<string>"),
                    ",",
                )
            ).alias("stream_md5"),
        )
    )


def bpe_token_counts(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, n_bpe_tokens) for the shard pipeline's packing budget —
    bpe_apply_encode without materializing the id arrays (the counts
    are sums of per-word symbol counts, so the corpus side shuffles
    only (doc_id, word) pairs and the vocab side only (word, n_syms)).

    ``docs`` overrides the corpus (doc_id/text): the shard pipeline
    passes its CLEANED relation so the tokenizer trains on — and the
    budgets meter — the text the dataloader actually consumes
    (redacted, optionally passage-rewritten), not the raw table. A
    cleaned-corpus word missing from the vocabulary is impossible by
    construction (same relation trains and encodes)."""
    _, vocab = _bpe_learn(spark, sf_dir, docs=docs)
    enc = vocab.select("word", F.size(_bpe_syms()).cast("long").alias("n_syms"))
    if docs is None:
        docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select("doc_id", "text").filter(F.col("text").isNotNull())
    w = exploded(base, ["doc_id"], tokens(), "word").filter(F.col("word") != "")
    return (
        w.join(enc, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").cast("long").alias("n_bpe_tokens"))
    )


@query(
    "tokenizer_fertility_report",
    oracle=f"""
    {_bpe_chain_cte()},
    enc AS MATERIALIZED (
        SELECT word, CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_syms
        FROM v{_BPE_ITERS}
    ),
    dw AS (
        SELECT doc_id, ws[j] AS word
        FROM (SELECT doc_id, {_TOKS_DUCK} AS ws
              FROM documents WHERE text IS NOT NULL) d,
             unnest(generate_series(1, len(ws))) AS u(j)
        WHERE ws[j] <> ''
    ),
    per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS words,
               CAST(sum(n_syms) AS BIGINT) AS toks
        FROM dw JOIN enc USING (word) GROUP BY doc_id
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(p.words) AS BIGINT) AS total_words,
           CAST(sum(p.toks) AS BIGINT) AS total_tokens,
           round(CAST(sum(p.toks) AS DOUBLE) / sum(p.words), 6) AS fertility,
           round(CAST(sum(length(d.text)) AS DOUBLE) / sum(p.toks), 6)
               AS chars_per_token
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """,
)
def tokenizer_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language — the published tokenizer-
    quality metric (tokens emitted per word; the multilingual-
    tokenizer literature's standard complaint is fertility blowup on
    under-represented languages) plus its inverse-compression twin
    (chars per token), for the corpus-trained BPE tokenizer. This is
    the evaluation a team runs BEFORE committing a vocabulary: a lang
    whose fertility is 2x the corpus mean pays 2x the context budget
    for the same content, and `domain_temperature_resample` /
    `shard_token_id_streams` budgets are only fair if metered in a
    tokenizer whose fertility is known.

    Plan/scale — the bpe_token_counts discipline: the learned merges
    rewrite the DISTINCT-WORD table, per-word symbol counts join the
    corpus's (doc_id, word) explode (text never shuffles as
    documents), per-doc sums then a tiny per-lang rollup. The whole
    BPE chain is the bpe_merge_iterations machinery reused; the
    oracle shares _bpe_chain_cte with the other three BPE oracles so
    an encoding change cannot desync them."""
    _, vocab = _bpe_learn(spark, sf_dir)
    enc = vocab.select("word", F.size(_bpe_syms()).cast("long").alias("n_syms"))
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select("doc_id", "text").filter(F.col("text").isNotNull())
    w = exploded(base, ["doc_id"], tokens(), "word").filter(F.col("word") != "")
    per_doc = (
        w.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("words"),
            F.sum("n_syms").cast("long").alias("toks"),
        )
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").alias("n_chars")
    )
    return (
        per_doc.join(d, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("words").cast("long").alias("total_words"),
            F.sum("toks").cast("long").alias("total_tokens"),
            F.round(F.sum("toks") / F.sum("words"), 6).alias("fertility"),
            F.round(F.sum("n_chars") / F.sum("toks"), 6).alias("chars_per_token"),
        )
    )


@query(
    "decontaminated_train_split",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, {_SPLIT_DUCK} AS split, {_TOKS_DUCK} AS toks
        FROM documents
    ), sh AS (
        SELECT doc_id, split, unnest({_13GRAMS_DUCK}) AS gram FROM t
    ), eval_grams AS (
        SELECT DISTINCT gram FROM sh WHERE split <> 'train'
    ), bad AS (
        SELECT DISTINCT s.doc_id
        FROM sh s JOIN eval_grams e ON s.gram = e.gram
        WHERE s.split = 'train'
    )
    SELECT t.lang,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN bad.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           CAST(sum(CASE WHEN bad.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_docs,
           CAST(sum(CASE WHEN bad.doc_id IS NULL
                         THEN coalesce(len(t.toks), 0) ELSE 0 END) AS BIGINT)
               AS kept_tokens
    FROM t LEFT JOIN bad ON t.doc_id = bad.doc_id
    WHERE t.split = 'train'
    GROUP BY t.lang
    """,
)
def decontaminated_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontaminated training split, end to end: the md5 doc_id split
    (train_val_test_split) composed with the PUBLISHED 13-gram
    sliding-window leakage protocol (contamination_13gram's inverted
    index, pointed the OTHER way — upgraded from the bigram
    demonstrator in r13, VERDICT task 4) — any train document sharing
    a 13-token window with val OR test is dropped, and the report says
    per language what survives and how many tokens ship to training.
    This is the step order real pipelines get wrong (decontaminate
    AFTER splitting, against the final eval sets — not before, when
    the split doesn't exist yet).

    Plan/scale: the split is a pure doc_id hash so each branch's
    predicate pushes below its explode (contamination_13gram's
    pushdown argument); eval 13-gram window identities are rolling-hash
    longs (r15 — the family's last md5-of-shingle-string consumer moved
    onto the `_gram_digests_from` device: no window string is ever
    materialized and the inverted-index shuffle carries 8-byte longs,
    not 32-char hex) collapsed to a distinct vocabulary; contaminated
    train doc_ids come from a LEFT SEMI join on gram and land as a
    narrow distinct id set; the final LEFT join marks drops against the
    train docs and aggregates per lang with map-side partials. Both
    branches prune to exactly the columns they touch: the gram branch
    never computes n_tokens, and the train branch tokenizes only to
    COUNT (Catalyst prunes the tv column, so it never hashes or rolls
    windows). At
    100 TB every shuffle carries ids or 8-byte window identities — the
    widest row is fixed-width. The DuckDB oracle keeps md5 window
    strings (an independent implementation of window equality — equal
    windows always hash equal on both sides).
    """
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text"))
    t = docs.select(
        "doc_id", "lang", _split_expr().alias("split"),
        token_hashes().alias("tv"),
        F.when(F.col("text").isNotNull(), F.size(tokens())).otherwise(0).alias("n_tokens"),
    )
    sh = exploded(t, ["doc_id", "split"], _gram_digests_from(F.col("tv"), 13), "gram")
    eval_grams = sh.filter(F.col("split") != "train").select("gram").distinct()
    bad = (
        sh.filter(F.col("split") == "train")
        .join(eval_grams, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_bad", F.lit(1))
    )
    train = t.filter(F.col("split") == "train").select("lang", "doc_id", "n_tokens")
    dropped = F.col("is_bad").isNotNull()
    return (
        train.join(bad, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.sum(F.when(dropped, 1).otherwise(0)).cast("long").alias("n_dropped"),
            F.sum(F.when(dropped, 0).otherwise(1)).cast("long").alias("kept_docs"),
            F.sum(F.when(dropped, 0).otherwise(F.col("n_tokens"))).cast("long").alias("kept_tokens"),
        )
    )
