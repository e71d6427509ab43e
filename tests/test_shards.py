"""Training-shard sink layout contract (sources/shards.py)."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from currency_etl_pipeline_spark.queries.llm_prep import packed_docs
from currency_etl_pipeline_spark.sources.shards import (
    read_training_shards,
    write_training_shards,
)
from currency_etl_pipeline_spark.tables import load_table


def test_shard_write_layout_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path)

    # Hive-partitioned by split then lang.
    splits = {d for d in os.listdir(path) if d.startswith("split=")}
    assert splits == {"split=train", "split=val", "split=test"}
    assert any(
        d.startswith("lang=") for d in os.listdir(os.path.join(path, "split=train"))
    )

    # Nothing lost, nothing duplicated, every ride-along column kept.
    back = read_training_shards(spark, path)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    assert {"doc_id", "text", "n_tokens", "shard_id", "split", "lang"} <= set(back.columns)

    # A split filter must prune at the partition level.
    pruned = read_training_shards(spark, path, split="train")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "split" in m.group(1), "split filter did not become a partition filter"

    # Shard ids must agree with the query-side per-(split, lang)
    # assignment: each split's shards are packed over that split's own
    # documents only.
    from currency_etl_pipeline_spark.queries.llm_prep import _split_expr

    with_split = docs.withColumn("split", _split_expr())
    expect = {
        (r["doc_id"], r["shard_id"])
        for r in packed_docs(with_split, strata=("split", "lang")).collect()
    }
    got = {(r["doc_id"], r["shard_id"]) for r in back.collect()}
    assert got == expect


def test_shards_pack_per_split_no_cross_split_slicing(spark, sf_dir, tmp_path):
    """The token-budget contract must hold WITHIN the advertised read
    path (one split): packing just the train documents from scratch
    reproduces exactly the shard assignment the sink wrote for
    split=train — i.e. shards are contiguous full-budget packs of the
    split's own doc sequence, not corpus-wide shards with val/test
    docs carved out (under-budget, gap-riddled)."""
    from currency_etl_pipeline_spark.queries.llm_prep import _split_expr

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards3")
    write_training_shards(docs, path)
    train = read_training_shards(spark, path, split="train")

    train_only = docs.withColumn("split", _split_expr()).filter(F.col("split") == "train")
    repacked = {
        (r["doc_id"], r["shard_id"]) for r in packed_docs(train_only).collect()
    }
    written = {(r["doc_id"], r["shard_id"]) for r in train.collect()}
    assert written == repacked, "train shards are not a standalone packing of train docs"
    # and shard ids per (split, lang) are a contiguous 0..max range
    per_stratum = (
        train.groupBy("lang")
        .agg(
            F.min("shard_id").alias("lo"),
            F.max("shard_id").alias("hi"),
            F.countDistinct("shard_id").alias("n"),
        )
        .collect()
    )
    for r in per_stratum:
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1, f"shard id gaps in lang={r['lang']}"


def test_shard_files_sorted_by_shard_then_doc(spark, sf_dir, tmp_path):
    """Every physical file must hold rows sorted by (shard_id, doc_id)
    — the sequential-read contract a dataloader relies on."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards2")
    write_training_shards(docs, path)
    rows = (
        read_training_shards(spark, path)
        .withColumn("file", F.input_file_name())
        .select("file", "shard_id", "doc_id")
        .collect()
    )
    by_file: dict = {}
    for r in rows:
        by_file.setdefault(r["file"], []).append((r["shard_id"], r["doc_id"]))
    assert by_file
    for f, keys in by_file.items():
        assert keys == sorted(keys), f"rows not sorted within {f}"


def test_shard_write_rejects_null_keys(spark, sf_dir, tmp_path):
    """Null doc_id/lang must fail loudly — the assignment join would
    otherwise drop those documents silently (data loss, not cleaning)."""
    import pytest
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").limit(5).withColumn(
        "lang", F.when(F.col("doc_id") == 0, F.lit(None)).otherwise(F.col("lang"))
    )
    with pytest.raises(ValueError, match="null doc_id/lang"):
        write_training_shards(docs, str(tmp_path / "bad"))


def test_end_to_end_training_pipeline(spark, sf_dir, tmp_path):
    """The one-call pipeline must land a corpus that is (a) gated —
    only en/de docs above the quality bar, (b) PII-free on disk,
    (c) exactly deduplicated on redacted text, (d) split/lang
    partitioned with per-split contiguous shards, and (e) faithfully
    described by the returned manifest."""
    from pyspark.sql import functions as F2

    from currency_etl_pipeline_spark.functions.redact import redact_pii
    from currency_etl_pipeline_spark.queries.text import blended_quality
    from currency_etl_pipeline_spark.sources.shards import run_training_data_pipeline

    out = str(tmp_path / "pipeline_shards")
    manifest = run_training_data_pipeline(spark, sf_dir, out)
    m = {(r["split"], r["lang"]): (r["n_shards"], r["n_docs"], r["total_tokens"]) for r in manifest.collect()}
    assert m, "empty manifest"
    assert {s for s, _ in m} <= {"train", "val", "test"}
    assert {l for _, l in m} <= {"en", "de"}, "gate leaked other languages"

    landed = read_training_shards(spark, out)
    # (a) every landed doc passes the gate when recomputed on the
    # redacted text it carries (redaction is idempotent, so the score
    # recomputes identically on what's on disk at fixture scale where
    # no PII changes token counts)
    docs = load_table(spark, sf_dir, "documents")
    expected = (
        docs.filter(F2.col("lang").isin("en", "de"))
        .filter(F2.round(blended_quality(), 6) >= 0.5)
        .select("doc_id", redact_pii(F2.col("text")).alias("text"))
    )
    exp_rows = {(r["doc_id"], r["text"]) for r in expected.collect()}
    # dedup keeps min doc_id per redacted text
    keeper: dict = {}
    for did, text in sorted(exp_rows):
        keeper.setdefault(text, did)
    want = {(did, text) for text, did in keeper.items()}
    got = {(r["doc_id"], r["text"]) for r in landed.select("doc_id", "text").collect()}
    assert got == want, "landed corpus != gate+redact+dedup of the source"
    # (b) no unredacted digit runs on disk
    assert landed.filter(F2.col("text").rlike("[0-9]{6,}")).count() == 0
    # (e) manifest matches what was landed
    check = {
        (r["split"], r["lang"]): (r["n_shards"], r["n_docs"], r["total_tokens"])
        for r in landed.groupBy("split", "lang")
        .agg(
            F2.countDistinct("shard_id").alias("n_shards"),
            F2.count(F2.lit(1)).alias("n_docs"),
            F2.sum("n_tokens").alias("total_tokens"),
        )
        .collect()
    }
    assert m == check


def _write_pii_docs(tmp_path, rows):
    """documents.parquet with (doc_id, text, lang, source) rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


def test_pipeline_on_pii_corpus_redacts_and_dedups_correctly(spark, tmp_path):
    """Non-vacuous pipeline semantics on a corpus that actually has
    PII and duplicates: length-differing PII twins collapse (same
    lang/source), identical text across lang or source does NOT
    collapse (stratum-scoped dedup key), gated-out docs never land,
    and NO digit run survives on disk — deleting the redaction step
    would fail this test."""
    from pyspark.sql import functions as F2

    from currency_etl_pipeline_spark.sources.shards import run_training_data_pipeline

    base = "the fast data table join merge sort " * 8
    _write_pii_docs(
        tmp_path,
        [
            (1, base + "call +1 555-0101 now", "en", "s1"),
            (2, base + "call +44 20 7946 0958 123 now", "en", "s1"),  # PII twin of 1
            (3, base + "call +1 555-0101 now", "de", "s1"),  # same text, other lang
            (4, base + "call +1 555-0101 now", "en", "s2"),  # same text, other source
            (5, base + "account 90210001234 ref", "en", "s1"),  # distinct after redact
            (6, base + "contact user6@mail.example.com now", "fr", "s1"),  # lang-gated out
        ],
    )
    out = str(tmp_path / "shards")
    run_training_data_pipeline(spark, str(tmp_path), out)
    landed = read_training_shards(spark, str(out))
    got = {
        (r["doc_id"], r["lang"], r["source"]) for r in landed.collect()
    }
    assert got == {(1, "en", "s1"), (3, "de", "s1"), (4, "en", "s2"), (5, "en", "s1")}, got
    # redaction proven: the grafted phones/ids are gone from disk
    assert landed.filter(F2.col("text").rlike("[0-9]{6,}")).count() == 0
    assert landed.filter(F2.col("text").contains("[PHONE]")).count() == 3
    assert landed.filter(F2.col("text").contains("[ID]")).count() == 1


def test_pipeline_optional_stages_compose(spark, sf_dir, tmp_path):
    """passage_dedup + perplexity gate as opt-in pipeline stages: with
    the flags on, landed shards must contain no globally duplicated
    16-word passage and no doc above the NLL cut, and the corpus must
    strictly shrink; with the flags off, output is byte-identical to
    the default pipeline (regression lock for existing deployments)."""
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.queries.llm_prep import (
        _PASSAGE_PAT,
        unigram_nll,
    )
    from currency_etl_pipeline_spark.sources.shards import (
        read_training_shards,
        run_training_data_pipeline,
    )

    base = str(tmp_path / "base")
    run_training_data_pipeline(spark, sf_dir, base)
    plain = read_training_shards(spark, base)

    strict = str(tmp_path / "strict")
    run_training_data_pipeline(
        spark, sf_dir, strict, passage_dedup=True, perplexity_nll_max=2.9
    )
    cleaned = read_training_shards(spark, strict)

    assert 0 < cleaned.count() < plain.count(), "opt-in stages did not shrink the corpus"

    # No 16-word passage occurs twice anywhere in the landed corpus.
    dup_passages = (
        cleaned.select(
            F.explode(
                F.regexp_extract_all(F.trim("text"), F.lit(_PASSAGE_PAT), 0)
            ).alias("p")
        )
        .groupBy("p")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup_passages == 0, f"{dup_passages} duplicated passages survived"

    # Rebuild the gate's own input (same stages, perplexity cut off)
    # and rescore with the pipeline's own fitted LM: every landed doc
    # must be at or under the cut, and the gate must have had real
    # work to do (at least one pre-gate doc above the cut) — deleting
    # the nll filter from the pipeline fails this.
    from currency_etl_pipeline_spark.sources.shards import build_training_corpus
    from currency_etl_pipeline_spark.tables import load_table

    pre_gate = build_training_corpus(
        load_table(spark, sf_dir, "documents"), passage_dedup=True
    )
    scored = unigram_nll(pre_gate.select("doc_id", "text"))
    landed_ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    by_id = {r["doc_id"]: r["nll_exact"] for r in scored.collect()}
    assert landed_ids <= set(by_id), "landed docs missing from the pre-gate corpus"
    worst_landed = max(by_id[i] for i in landed_ids)
    assert worst_landed <= 2.9, f"landed doc above the NLL cut: {worst_landed}"
    assert any(v > 2.9 for v in by_id.values()), (
        "perplexity gate was vacuous: no pre-gate doc exceeds the cut"
    )

    # Flags-off path unchanged: same rows as the plain run.
    again = str(tmp_path / "again")
    run_training_data_pipeline(spark, sf_dir, again)
    assert sorted(map(tuple, read_training_shards(spark, again).collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_packed_docs_raises_when_block_offsets_exceed_cap(spark, sf_dir):
    """The block-offset broadcast is bounded BY CONSTRUCTION: when a
    stratum's block count exceeds max_blocks the packer raises inside
    the plan (no extra job) instead of silently broadcasting a
    corpus-proportional table — the guard the hint lint's bounded
    `block` declaration rests on (tests/test_scale_plans.py)."""
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    # Fixture corpus has ~500 docs → ~8 blocks/lang at width 64: a cap
    # of 2 blocks must trip, the default cap must not.
    with pytest.raises(Exception, match="max_blocks"):
        packed_docs(docs, max_blocks=2).collect()
    assert packed_docs(docs).count() > 0


def test_pipeline_semdedup_stage_composes(spark, sf_dir, tmp_path):
    """semdedup=True as an opt-in pipeline stage: landed shards must
    contain NO doc the embedding-space pass prunes (and every gated
    survivor that isn't pruned), and semdedup=False must land the same
    rows as the default pipeline — the flags-off regression lock every
    opt-in stage carries (row-level, the compose test's convention:
    parquet part names embed write UUIDs, so byte trees never match)."""
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.queries.vectors import semdedup_cell_prune
    from currency_etl_pipeline_spark.sources.shards import (
        read_training_shards,
        run_training_data_pipeline,
    )

    base, off, on = (str(tmp_path / d) for d in ("base", "off", "on"))
    run_training_data_pipeline(spark, sf_dir, base)
    run_training_data_pipeline(spark, sf_dir, off, semdedup=False)
    run_training_data_pipeline(spark, sf_dir, on, semdedup=True)

    def landed(p):
        return {r["doc_id"] for r in read_training_shards(spark, p).select("doc_id").collect()}

    def rows(p):
        return sorted(map(tuple, read_training_shards(spark, p).collect()))

    assert rows(off) == rows(base), "semdedup=False must land identical rows"

    pruned = {
        r["vec_id"]
        for r in semdedup_cell_prune(spark, sf_dir).filter(F.col("pruned")).collect()
    }
    assert pruned, "fixture must prune at least one vector — vacuous otherwise"
    base_ids, on_ids = landed(base), landed(on)
    assert on_ids == base_ids - pruned, (
        "semdedup stage must drop exactly the pruned ids among landed docs"
    )


def test_pipeline_bpe_tokens_stage_composes(spark, sf_dir, tmp_path):
    """bpe_tokens=True as an opt-in pipeline stage: shard budgets are
    metered in LEARNED BPE tokens computed over the CLEANED corpus (the
    text the dataloader consumes — code-review r11 finding: raw-table
    counts would let a redacted/rewritten doc hog budget it no longer
    uses) — every landed doc's n_tokens must equal its cleaned-corpus
    bpe_token_counts row (never the whitespace count), doc membership
    is unchanged (BPE changes budgets, not admission), and
    bpe_tokens=False lands rows identical to the default pipeline (the
    flags-off regression lock every opt-in stage carries)."""
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.queries.llm_prep import bpe_token_counts
    from currency_etl_pipeline_spark.sources.shards import (
        build_training_corpus,
        read_training_shards,
        run_training_data_pipeline,
    )
    from currency_etl_pipeline_spark.tables import load_table

    base, off, on = (str(tmp_path / d) for d in ("base", "off", "on"))
    run_training_data_pipeline(spark, sf_dir, base)
    run_training_data_pipeline(spark, sf_dir, off, bpe_tokens=False)
    manifest = run_training_data_pipeline(spark, sf_dir, on, bpe_tokens=True)

    def rows(p):
        return sorted(map(tuple, read_training_shards(spark, p).collect()))

    assert rows(off) == rows(base), "bpe_tokens=False must land identical rows"

    cleaned = build_training_corpus(load_table(spark, sf_dir, "documents"))
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(
            spark, sf_dir, docs=cleaned.select("doc_id", "text")
        ).collect()
    }
    landed = read_training_shards(spark, on).select("doc_id", "n_tokens").collect()
    base_ids = {
        r["doc_id"]
        for r in read_training_shards(spark, base).select("doc_id").collect()
    }
    assert {r["doc_id"] for r in landed} == base_ids, "membership must not change"
    ws = {
        r["doc_id"]: r["n"]
        for r in read_training_shards(spark, base)
        .select("doc_id", F.expr("size(split(trim(text), '\\\\s+'))").alias("n"))
        .collect()
    }
    diff = [d for d in base_ids if counts.get(d, 0) != ws[d]]
    assert diff, "fixture must have docs where BPE count != whitespace count"
    for r in landed:
        assert r["n_tokens"] == counts.get(r["doc_id"], 0), (
            f"doc {r['doc_id']} packed at {r['n_tokens']}, "
            f"bpe count {counts.get(r['doc_id'], 0)}"
        )
    total = sum(r["total_tokens"] for r in manifest.collect())
    assert total == sum(counts.get(d, 0) for d in base_ids)

    # r12 (VERDICT r11 task 6): the shards carry the LEARNED token_ids
    # — the artifact a trainer's dataloader actually consumes — and
    # the packing budget is exactly the id count: size(token_ids) ==
    # n_tokens for every landed row, and an independent re-encode of
    # the cleaned corpus reproduces the landed ids bit-for-bit.
    from currency_etl_pipeline_spark.queries.llm_prep import bpe_encode_docs

    with_ids = read_training_shards(spark, on).select(
        "doc_id", "n_tokens", "token_ids"
    )
    bad = with_ids.filter(F.size("token_ids") != F.col("n_tokens")).count()
    assert bad == 0, "every landed row's id count must equal its packed budget"
    landed_ids = {
        r["doc_id"]: tuple(r["token_ids"]) for r in with_ids.collect()
    }
    re_enc = {
        r["doc_id"]: tuple(r["token_ids"])
        for r in bpe_encode_docs(
            spark, sf_dir, docs=cleaned.select("doc_id", "text")
        ).collect()
    }
    for d, ids in landed_ids.items():
        assert ids == re_enc.get(d, ()), f"doc {d}: landed ids != re-encode"
