"""Training-shard sink: the last step of the training-data pipeline
— materialize the cleaned corpus as hive-partitioned parquet shards
a trainer's dataloader can consume split-by-split.

The reference's pipeline stops at "load the cleaned table into the
warehouse" (load.py:1-34); this is the same load step re-aimed at a
training corpus: deterministic split + token-budget shard assignment
(queries/llm_prep.py), laid out so that

- `split=...` / `lang=...` are partition DIRECTORIES → a trainer
  reading only `split=train` prunes val/test at the file-listing
  level (PartitionFilters, no data IO; pinned in
  tests/test_shards.py);
- rows within every file are sorted by (shard_id, doc_id) → a
  sequential reader sees each shard's documents contiguously in
  packing order, which is the order the packer budgeted them in.

At 100 TB the repartition key would extend to a shard bucket
(e.g. shard_id DIV 1024) to bound file sizes; the layout contract —
partition dirs for pruning, sorted rows for sequential shard reads —
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from currency_etl_pipeline_spark.queries.llm_prep import (
    PACK_BLOCK,
    PACK_BUDGET,
    _split_expr,
    packed_docs,
)


def write_training_shards(
    docs: DataFrame,
    path: str,
    budget: int = PACK_BUDGET,
    block: int = PACK_BLOCK,
    token_count=None,
) -> None:
    """Assign (split, shard_id) to every document and write the corpus
    as `path/split=*/lang=*/part-*.parquet`, each file sorted by
    (shard_id, doc_id).

    The split is assigned FIRST and the packer runs per (split, lang)
    stratum, so within each split every shard is a contiguous,
    gap-free, full-budget pack — the token-budget contract a
    dataloader reading only `split=train` relies on. (Packing the
    whole corpus and splitting afterwards would slice shards across
    splits: a "train" shard could be far under budget with doc_id
    gaps where its val/test documents were carved out.)

    ``docs`` must carry (doc_id, lang, text) with doc_id and lang
    non-null; all other columns ride along into the shards. Null keys
    are rejected up front — packed_docs filters them and the
    assignment join would otherwise drop those documents SILENTLY,
    which for a training corpus is data loss, not cleaning.
    """
    n_bad = docs.filter(
        docs.doc_id.isNull() | docs.lang.isNull()
    ).count()
    if n_bad:
        raise ValueError(
            f"{n_bad} document(s) have null doc_id/lang; clean or quarantine "
            "them explicitly before sharding (they would be silently dropped)"
        )
    with_split = docs.withColumn("split", _split_expr())
    assigned = with_split.join(
        packed_docs(
            with_split,
            budget=budget,
            block=block,
            strata=("split", "lang"),
            token_count=token_count,
        ),
        ["doc_id", "split", "lang"],
    )
    (
        assigned.repartition("split", "lang")
        .sortWithinPartitions("shard_id", "doc_id")
        .write.partitionBy("split", "lang")
        .mode("overwrite")
        .parquet(path)
    )


def read_training_shards(
    spark: SparkSession, path: str, split: str | None = None
) -> DataFrame:
    """Read shards back; a ``split`` filter prunes at the partition
    level (never touches other splits' files)."""
    df = spark.read.parquet(path)
    if split is not None:
        df = df.filter(df.split == split)
    return df


def build_training_corpus(
    docs: DataFrame,
    passage_dedup: bool = False,
    perplexity_nll_max: float | None = None,
) -> DataFrame:
    """The cleaning half of the end-to-end pipeline: quality gate →
    PII redaction → exact dedup on the redacted text (min-doc_id
    keeper), plus two OPT-IN stages (both off by default so existing
    deployments land byte-identical shards):

    - ``passage_dedup=True`` → sub-document rewrite dropping globally
      duplicated 16-word passages (queries/llm_prep.passage_rewrite);
      docs whose every passage was seen earlier drop out entirely;
    - ``perplexity_nll_max=<nats>`` → CCNet-style unigram-LM outlier
      cut (queries/llm_prep.unigram_nll), fit on the gated+deduped
      corpus itself; docs with mean NLL above the cut drop. The join
      back is on doc_id with narrow score rows.

    Returns the cleaned corpus with the SAME columns as the input
    documents table — text already redacted (and passage-rewritten if
    enabled), n_chars recomputed — ready for ``write_training_shards``.

    Every stage is the same operator the catalog queries pin
    individually (quality_filter / redact_pii_documents /
    training_shard_prep / passage_dedup_rewrite /
    perplexity_quality_score); this function is their composition: gate
    and redaction are per-row codegen on the scan, the dedup is a
    single row_number window over the 32-char digest (the text itself
    never shuffles as a key), keeper rows pass through unchanged.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from currency_etl_pipeline_spark.functions.redact import redact_pii
    from currency_etl_pipeline_spark.queries.text import corpus_gate

    gated = docs.filter(corpus_gate())
    redacted = gated.withColumn("text", redact_pii(F.col("text"))).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    # Same dedup key as training_shard_prep: (redacted hash, lang,
    # source) — hashing alone would collapse identical texts ACROSS
    # languages/sources and silently drop the other stratum's copy.
    w = Window.partitionBy(F.md5("text"), "lang", "source").orderBy("doc_id")
    corpus = (
        redacted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if passage_dedup:
        from currency_etl_pipeline_spark.queries.llm_prep import passage_rewrite

        # Deliberately CORPUS-GLOBAL, unlike the doc-level dedup above
        # which partitions by (lang, source): a duplicated passage is
        # boilerplate (headers, licenses, templates) whose repetition is
        # noise in ANY stratum, so the keep-first rule spans strata —
        # the standard boilerplate-removal semantic. Doc-level dedup
        # stays stratified because there a full doc IS the stratum's
        # representation and dropping the copy would skew domain mixes.
        corpus = (
            passage_rewrite(corpus, keep_cols=("lang", "source"))
            .filter(F.col("n_kept") > 0)
            .select(
                "doc_id",
                F.col("clean_text").alias("text"),
                "lang",
                "source",
                F.length("clean_text").cast("long").alias("n_chars"),
            )
        )
    if perplexity_nll_max is not None:
        from currency_etl_pipeline_spark.queries.llm_prep import unigram_nll

        # The scorer and the join's left side both read the cleaned
        # corpus; column pruning specializes the two subtrees (the LM
        # needs only doc_id/text) so no exchange is shared — pin the
        # lineage once instead of re-running gate + redaction + dedup
        # (+ passage rewrite) on both branches (FIXTURES.md rule 16).
        corpus = corpus.localCheckpoint()
        keep = unigram_nll(corpus).filter(
            F.col("nll_exact") <= F.lit(float(perplexity_nll_max))
        )
        corpus = corpus.join(keep.select("doc_id"), "doc_id")
    return corpus


def run_training_data_pipeline(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    budget: int = PACK_BUDGET,
    block: int = PACK_BLOCK,
    passage_dedup: bool = False,
    perplexity_nll_max: float | None = None,
    semdedup: bool = False,
    bpe_tokens: bool = False,
) -> DataFrame:
    """END-TO-END training-data pipeline in one call — the training
    twin of the reference's fetch→transform→load entry point (EP1):
    load documents → quality gate → PII redaction → exact dedup →
    [opt-in: semantic dedup] → deterministic split → per-(split, lang)
    token packing → hive-partitioned shard sink. Returns the manifest:
    per (split, lang) shard/doc/token totals, read back from the
    written shards so the manifest reports what actually landed.

    ``semdedup=True`` (off by default — flags-off shards stay
    byte-identical) additionally drops documents the SemDeDup pass
    prunes in EMBEDDING space (queries/vectors.semdedup_cell_prune):
    paraphrases and re-encodings the text-hash dedup structurally
    misses. Contract: the embeddings table keys vectors by the same id
    as documents (vec_id ≡ doc_id — the testdata layout; a real
    deployment embeds the corpus and carries doc_id through). The
    pruned-id relation is near-dup-density-sized and anti-joins the
    cleaned corpus on doc_id — one narrow join, text never reshuffles.

    ``bpe_tokens=True`` (off by default — flags-off shards stay
    byte-identical) meters shard budgets in LEARNED BPE tokens instead
    of whitespace counts: the merge table is trained on the CLEANED
    corpus — the text the dataloader actually consumes, post-redaction
    and post-optional-rewrite (queries/llm_prep._bpe_learn — one
    corpus pass, then vocabulary-sized rounds) — and each document's
    count is the sum of its words' post-merge symbol counts
    (bpe_token_counts; the corpus shuffles only (doc_id, word) pairs).
    The count rides the corpus as n_bpe_tokens into the shards, so a
    dataloader can verify the budget it actually consumes.
    """
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    cleaned = build_training_corpus(
        docs, passage_dedup=passage_dedup, perplexity_nll_max=perplexity_nll_max
    )
    if semdedup:
        from currency_etl_pipeline_spark.queries.vectors import semdedup_cell_prune

        pruned = (
            semdedup_cell_prune(spark, sf_dir)
            .filter(F.col("pruned"))
            .select(F.col("vec_id").alias("doc_id"))
        )
        cleaned = cleaned.join(pruned, "doc_id", "left_anti")
    # The cleaning plan (regex redaction + dedup window) feeds the
    # sink's null-key guard count AND the two-branch packing write —
    # and, with bpe_tokens=True, the BPE trainer's word histogram
    # (localCheckpointed at BUILD time) plus the count join. Persist
    # BEFORE the BPE branch so every consumer reads the cached
    # relation instead of re-cleaning the corpus (cache, not
    # checkpoint: recomputable lineage on executor loss).
    cleaned = cached = cleaned.persist()
    token_count = None
    enc_cached = None
    try:
        if bpe_tokens:
            from currency_etl_pipeline_spark.queries.llm_prep import bpe_encode_docs

            # Train on, meter, AND ENCODE the CLEANED corpus — the text
            # the dataloader actually consumes (redacted, optionally
            # passage-rewritten), not the raw table. The shards land the
            # learned token_ids alongside the text (r12, VERDICT r11
            # task 6): the artifact a trainer reads is the id stream,
            # and the budget that packed it is exactly size(token_ids).
            # The encode relation is ITSELF persisted (review r12): the
            # write drives three subtrees over the join below (null-key
            # guard count, packed_docs branch, assignment-join left
            # side), and without the pin each would re-run the
            # corpus-sized encode (explode + vocab join + collect).
            enc_cached = bpe_encode_docs(
                spark, sf_dir, docs=cleaned.select("doc_id", "text")
            ).select("doc_id", "token_ids", "n_bpe_tokens").persist()
            # Left join: a cleaned doc whose text is degenerate (no
            # words) has no encode row — it packs at 0 tokens with an
            # empty id stream rather than dropping.
            cleaned = (
                cleaned.join(enc_cached, "doc_id", "left")
                .withColumn(
                    "n_bpe_tokens", F.coalesce("n_bpe_tokens", F.lit(0).cast("long"))
                )
                .withColumn(
                    "token_ids",
                    F.coalesce("token_ids", F.array().cast("array<bigint>")),
                )
            )
            token_count = F.col("n_bpe_tokens")
        write_training_shards(
            cleaned, path, budget=budget, block=block, token_count=token_count
        )
    finally:
        cached.unpersist()
        if enc_cached is not None:
            enc_cached.unpersist()
    landed = read_training_shards(spark, path)
    return landed.groupBy("split", "lang").agg(
        F.countDistinct("shard_id").alias("n_shards"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
