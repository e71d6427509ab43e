"""Physical-plan regression tests — the 100 TB properties.

Correctness tests prove the answers; these prove the PLANS stay the
shape that survives scale-up: filters reach the parquet scan, small
dims broadcast, identical self-join sides share one exchange, bucketed
joins skip the shuffle entirely, and the partitioned warehouse prunes
partitions. A refactor that silently regresses one of these still
passes every oracle check — only these tests catch it.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from currency_etl_pipeline_spark.queries import all_queries
from currency_etl_pipeline_spark.tables import load_table

SPECS = all_queries()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def executed_plan_of(df) -> str:
    # Execute THIS Dataset's own QueryExecution (a noop write would plan
    # a separate, never-executed command), so AQE finalizes the plan we
    # then read back. AdaptiveSparkPlan.toString() appends the
    # "== Initial Plan ==" section — strip it so assertions only see the
    # finalized plan.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_q3_filters_reach_scans(spark, sf_dir):
    plan = plan_of(SPECS["tpch_q3_shipping_priority"].spark(spark, sf_dir))
    assert "GreaterThan(l_shipdate" in plan, "lineitem date filter not pushed to scan"
    assert "LessThan(o_orderdate" in plan, "orders date filter not pushed to scan"
    assert "TakeOrderedAndProject" in plan, "top-10 should be a top-k, not a global sort"


def test_q3_prunes_columns(spark, sf_dir):
    plan = plan_of(SPECS["tpch_q3_shipping_priority"].spark(spark, sf_dir))
    li_schemas = re.findall(r"ReadSchema: struct<(l_[^>]*)>", plan)
    assert li_schemas, "no lineitem scan found"
    for s in li_schemas:
        cols = {c.split(":")[0] for c in s.split(",")}
        assert cols <= {"l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"}, (
            f"lineitem scan reads more than the query needs: {cols}"
        )


def test_q5_filters_reach_scans(spark, sf_dir):
    plan = plan_of(SPECS["tpch_q5_local_supplier_volume"].spark(spark, sf_dir))
    assert "EqualTo(r_name,ASIA)" in plan, "region filter not pushed to scan"
    assert "GreaterThanOrEqual(o_orderdate" in plan, "order-year filter not pushed to scan"
    assert "BroadcastHashJoin" in plan, "dim sides should broadcast"


def test_q10_is_topk_with_pushed_filters(spark, sf_dir):
    plan = plan_of(SPECS["tpch_q10_returned_items"].spark(spark, sf_dir))
    assert "EqualTo(l_returnflag,R)" in plan, "returnflag filter not pushed to scan"
    assert "GreaterThanOrEqual(o_orderdate" in plan, "quarter filter not pushed to scan"
    assert "TakeOrderedAndProject" in plan, "top-20 should be a top-k, not a global sort"


def test_revenue_by_region_broadcasts_dims(spark, sf_dir):
    plan = plan_of(SPECS["revenue_by_region"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "dim joins should broadcast, not shuffle"


def test_jaccard_shares_one_shingle_subtree(spark, sf_dir):
    """The self-join sides are identical plans; the expensive shingle
    pipeline must be evaluated once and shared (ReusedExchange /
    reused shuffle read), never re-planned per downstream branch — and
    InferFiltersFromGenerate must not clone the shingle expression into
    a pushed Filter (the regression counts zip_with occurrences, which
    that clone would inflate)."""
    plan = executed_plan_of(SPECS["near_dup_jaccard_pairs"].spark(spark, sf_dir))
    # Healthy shape: 3 expression sites (the corpus union's two branch
    # projections + the one inferred size()-not-null filter on the same
    # stage), each containing 2 textual zip_with calls (n=3 shingles
    # compose two zip_with levels) -> 6. The 162s regression this guards
    # re-evaluated the subtree once per downstream branch (several more
    # sites, single-threaded below the exchange).
    n_shingle_exprs = plan.count("zip_with")
    assert n_shingle_exprs <= 6, (
        f"shingle zip_with expression appears {n_shingle_exprs} times — "
        "the tokenizer subtree is being re-evaluated per branch"
    )
    assert "ReusedExchange" in plan, "self-join sides no longer share one exchange"


def test_time_range_join_is_bucketed(spark, sf_dir):
    """purchases_within_1h_before_click must equi-join on
    (user_id, hour_bucket), not user_id alone: with only user_id as the
    join key a hot user's clicks × purchases is quadratic per key. The
    bucket must appear in the join KEYS (hash-partitioning the shuffle),
    not as a post-join filter. Broadcast is disabled to get the
    100 TB regime (both sides too big to broadcast → sort-merge)."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(SPECS["purchases_within_1h_before_click"].spark(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    m = re.search(r"Left keys \[(\d+)\]: \[([^\]]*)\]", plan)
    assert m, f"no equi-join keys found in plan:\n{plan}"
    n_keys, keys = int(m.group(1)), m.group(2)
    assert n_keys == 2 and "bkt" in keys, (
        f"time-range join should key on (user_id, bkt); got [{keys}]"
    )


def test_cosession_join_is_hour_bucketed(spark, sf_dir):
    """concurrent_session_pairs must equi-join its segment self-join on
    the HOUR bucket (the r10 scale knob — the r9 day-bucket form was
    the slowest non-streaming query, per-day quadratic on co-present
    users). The bucket must be the join KEY, not a residual filter,
    and the per-bucket candidate multiset must actually shrink: every
    hour bucket's segment count is <= its containing day's (strictly
    partitioning the day population). n_joint counts distinct session
    pairs, so the shard unit cannot leak into the answer (the
    day-split DuckDB oracle pins that)."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(SPECS["concurrent_session_pairs"].spark(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    m = re.search(r"Left keys \[(\d+)\]: \[([^\]]*)\]", plan)
    assert m, f"no equi-join keys found in plan:\n{plan}"
    assert "hr" in m.group(2), (
        f"co-session self-join should key on the hour bucket; got [{m.group(2)}]"
    )
    # Bucket-boundedness property: hourly bucket populations partition
    # each day's population, so max per-hour candidates <= max per-day.
    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("sw.start").alias("s"), F.col("sw.end").alias("e"))
    )
    by_hr = (
        sess.select(F.explode(F.sequence(
            F.date_trunc("hour", F.col("s")),
            F.date_trunc("hour", F.expr("e - INTERVAL 1 MICROSECOND")),
            F.expr("INTERVAL 1 HOUR"),
        )).alias("b")).groupBy("b").count().agg(F.max("count")).first()[0]
    )
    by_day = (
        sess.select(F.explode(F.sequence(
            F.to_date("s"), F.to_date(F.expr("e - INTERVAL 1 MICROSECOND"))
        )).alias("b")).groupBy("b").count().agg(F.max("count")).first()[0]
    )
    assert by_hr <= by_day, (by_hr, by_day)
    assert by_hr < by_day, (
        "hour shard did not reduce the densest bucket at this sf — "
        "the scale knob is vacuous on this fixture"
    )


def test_embedding_neardup_lsh_has_no_nested_loop(spark, sf_dir):
    """The LSH-routed embedding near-dup must candidate via the
    (band, bucket) equi-join — never a nested-loop/cartesian pass over
    the corpus (that is exactly the all-pairs anti-pattern it exists to
    replace; the all-pairs form survives only as scaffolding)."""
    plan = plan_of(SPECS["near_dup_embeddings_lsh"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # The only tolerated nested loop is the 16-row broadcast plane
    # crossJoin that computes signatures — one node per self-join side
    # (AQE dedups them into a ReusedExchange at runtime), each printed
    # twice by the formatted explain (tree + detail section) -> <= 4
    # textual hits. A corpus-sized nested loop would add more.
    assert plan.count("BroadcastNestedLoopJoin") <= 4, (
        "corpus-sized nested-loop join crept into the LSH near-dup plan"
    )
    assert re.search(r"keys \[\d+\]: \[[^\]]*bucket", plan) or re.search(
        r"\[bucket[^\]]*\], \[bucket", plan
    ), f"no equi-join on the LSH bucket found:\n{plan}"


def test_embedding_neardup_lsh_recall(spark, sf_dir):
    """Deterministic recall floor vs the exact all-pairs baseline over
    the full corpus, with exact precision (the cosine filter verifies
    every candidate, so LSH pairs are a strict subset of true pairs).
    The testdata's near-dups sit at cos 0.4-0.51 — the hardest regime
    for LSH (marginal pairs); on a real corpus with true duplicates at
    cos >= 0.9, 4 bands x 4 bits recalls 1-(1-0.9^4)^4 ~ 0.96."""
    from currency_etl_pipeline_spark.queries.vectors import _vecs, cosine

    v = _vecs(spark, sf_dir).select("vec_id", "v")
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    exact = {
        (r[0], r[1])
        for r in a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= 0.4)
        .select("vec_a", "vec_b")
        .collect()
    }
    lsh = {(r[0], r[1]) for r in SPECS["near_dup_embeddings_lsh"].spark(spark, sf_dir).collect()}
    assert lsh <= exact, "LSH produced a pair the exact baseline rejects"
    assert exact, "baseline found no pairs — threshold no longer matches testdata"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.35, f"LSH recall collapsed: {recall:.3f}"


def test_ivf_trained_recall(spark, sf_dir):
    """KMeans-trained IVF (nprobe=2 of 8 cells) must recall a usable
    fraction of the exact cosine top-5 per query. Measured 0.53-0.60 on
    the testdata; 0.4 floor leaves margin for k-means|| init shifting
    with partitioning while still catching a broken assignment or probe
    selection (random cells would recall ~2/8 of the corpus ~ 0.25)."""
    from currency_etl_pipeline_spark.queries.advanced import ivf_trained_search

    trained = {
        (r["query_id"], r["vec_id"])
        for r in ivf_trained_search(spark, sf_dir).collect()
    }
    exact = SPECS["cosine_topk_bruteforce"].spark(spark, sf_dir).collect()
    per_query: dict = {}
    top5 = set()
    for r in sorted(exact, key=lambda r: (r["query_id"], -r["cos_sim"], r["vec_id"])):
        per_query.setdefault(r["query_id"], 0)
        if per_query[r["query_id"]] < 5:
            per_query[r["query_id"]] += 1
            top5.add((r["query_id"], r["vec_id"]))
    assert len(trained) == len(top5) == 15
    recall = len(trained & top5) / len(top5)
    assert recall >= 0.4, f"trained-IVF recall collapsed: {recall:.3f}"
    # The registered verdict (r11 bound-verdict form) must agree with
    # this raw measurement — 3 rows, every flag true.
    verdict = SPECS["ivf_ann_topk_trained"].spark(spark, sf_dir).collect()
    assert len(verdict) == 3
    assert all(r["has_k_rows"] and r["recall_ok"] for r in verdict)


def test_point_lookup_is_topk_not_sort(spark, sf_dir):
    plan = plan_of(SPECS["point_lookup_latest"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    from currency_etl_pipeline_spark.sources.bucketed import bucketed_join, write_bucketed

    # (managed tables land in the session's spark-warehouse dir; DROP
    # TABLE in the finally deletes the data too)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "orders_b", ["o_orderkey"], num_buckets=4)
    write_bucketed(li, "lineitem_b", ["o_orderkey"], num_buckets=4)
    # At test scale the optimizer rightly broadcasts instead (bucketing
    # is "disabled by query planner"); force the big-table regime the
    # feature exists for.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", ["o_orderkey"])
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
        assert "Bucketed: true" in plan
        # and it is still a correct join
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_ivf_corpus_partitioned_by_cell_prunes(spark, sf_dir, tmp_path):
    """The IVF docstrings claim that at scale the assigned corpus is
    written partitioned BY cid so probing nprobe cells is partition
    pruning, not a join. Pin that: materialize the assignment
    partitioned by cid, probe two cells, and require the cid filter to
    land in PartitionFilters (only those directories scanned)."""
    from currency_etl_pipeline_spark.queries.vectors import _vecs, cosine
    from currency_etl_pipeline_spark.queries.advanced import CENTROID_IDS

    v = _vecs(spark, sf_dir)
    cents = F.broadcast(
        v.filter(F.col("vec_id").isin(*CENTROID_IDS)).select(
            (F.col("vec_id") - 20).alias("cid"), F.col("v").alias("cv")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cid").asc())
    assigned = (
        v.crossJoin(cents)
        .select("vec_id", "v", "cid", F.round(cosine(F.col("v"), F.col("cv")), 6).alias("csim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )
    path = str(tmp_path / "ivf_corpus")
    assigned.write.partitionBy("cid").parquet(path)

    probe = spark.read.parquet(path).filter(F.col("cid").isin(1, 3))
    plan = plan_of(probe)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cid" in m.group(1), "probe filter did not become a partition filter"
    assert probe.count() > 0


def test_historical_partition_pruning(spark, tmp_path):
    from currency_etl_pipeline_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh2"))
    batch = spark.createDataFrame(
        [("USD", "EGP", 47.6, d, d) for d in ["2024-01-01 10:00:00", "2024-01-02 10:00:00", "2024-01-03 10:00:00"]],
        "base_currency string, target_currency string, rate double, timestamp string, retrieved_at string",
    ).withColumn("timestamp", F.to_timestamp("timestamp")).withColumn("retrieved_at", F.to_timestamp("retrieved_at"))
    wh.append_historical(batch)
    pruned = spark.read.parquet(wh.historical_path).filter(F.col("rate_date") == "2024-01-02")
    plan = plan_of(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "rate_date" in m.group(1), "date filter did not become a partition filter"
    assert pruned.count() == 1


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A dim-side filter must prune fact partitions at RUNTIME (DPP):
    the fact scan's PartitionFilters carries a dynamicpruning subquery
    fed by the dim. At 100 TB this is the difference between scanning
    one day and scanning the whole history when the cut is only known
    via a join."""
    ev = load_table(spark, sf_dir, "events")
    fact_path, dim_path = str(tmp_path / "fact"), str(tmp_path / "dim")
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy("event_date").parquet(fact_path)
    (
        ev.select(F.to_date("ts").alias("event_date")).distinct()
        .withColumn("flag", F.dayofmonth("event_date"))
        .write.parquet(dim_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("flag") == 5)
    joined = fact.join(dim, "event_date")
    plan = plan_of(joined)
    assert "dynamicpruningexpression" in plan, "no runtime partition pruning in fact scan"
    assert joined.count() > 0


def test_q17_decorrelated_window_single_scan(spark, sf_dir):
    """Q17's correlated scalar compiles to per-part window aggregates
    over the brand-filtered join: the brand filter reaches the part
    scan, the part side broadcasts, lineitem is scanned exactly ONCE
    (the agg-then-rejoin form scans it twice), and no per-row subquery
    shape (nested loop / cartesian) appears."""
    plan = plan_of(SPECS["tpch_q17_small_quantity_revenue"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "brand-part side should broadcast"
    assert "EqualTo(p_brand,Brand#23)" in plan, "brand filter not pushed to part scan"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("lineitem.parquet") == 1, "lineitem scanned more than once"


def test_q15_single_quarter_scan(spark, sf_dir):
    """Q15's global max is a window over the post-aggregation rev
    rows; the quarter-filtered lineitem scan + agg must appear once,
    not once per branch."""
    plan = plan_of(SPECS["tpch_q15_top_supplier"].spark(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, "lineitem scanned more than once"
    assert "GreaterThanOrEqual(l_shipdate" in plan, "quarter filter not pushed"


def test_q13_outer_join_keeps_zero_bucket(spark, sf_dir):
    """Q13's orders-side filter must stay IN the join (pushed to the
    orders scan is fine — it's the non-preserved side) without
    converting the LEFT OUTER to inner, or zero-order customers fall
    out of the histogram."""
    df = SPECS["tpch_q13_customer_distribution"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "LeftOuter" in plan, "outer join was converted to inner"
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan, (
        "orders filter should push to the orders scan (non-preserved side)"
    )


def test_q6_pure_scan_agg_no_join_no_shuffle_of_rows(spark, sf_dir):
    """Q6 must compile to scan→filter→partial agg→final agg: all three
    predicates pushed to the parquet scan, a 4-column ReadSchema, and
    no join anywhere."""
    plan = plan_of(SPECS["tpch_q6_forecast_revenue"].spark(spark, sf_dir))
    assert "Join" not in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan, "shipdate lower bound not pushed"
    assert "LessThan(l_quantity" in plan, "quantity filter not pushed"
    schemas = re.findall(r"ReadSchema: struct<(l_[^>]*)>", plan)
    assert schemas and all(len(s.split(",")) <= 4 for s in schemas), (
        f"scan should read exactly the 4 referenced columns: {schemas}"
    )


def test_q19_part_disjunction_prefilters_build_side(spark, sf_dir):
    """Q19's part-only OR (brand+size bands) must reach the part scan
    as a pushed filter so the broadcast build side shrinks to 3 brands
    BEFORE the join; the mixed residual stays in the join filter."""
    plan = plan_of(SPECS["tpch_q19_disjunctive_revenue"].spark(spark, sf_dir))
    assert "Or(And(EqualTo(p_brand,Brand#12)" in plan, (
        "part-side disjunction not pushed to the part scan"
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q8_dims_broadcast_only_fact_shuffles(spark, sf_dir):
    """Q8's 8-way tree: explicit hints only on the bounded dims
    (nation/region); the customer/supplier/part sides must still end
    up broadcast at THIS scale via AQE (final plan), without hints
    that would force a GB-scale broadcast at real TPC-H scale."""
    plan = executed_plan_of(SPECS["tpch_q8_market_share"].spark(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4, "dim joins should all broadcast"
    assert "p_type" in plan and "PROMO" in plan, "part type filter missing"
    assert "r_name" in plan and "ASIA" in plan, "region filter missing"


def test_q21_aggregates_once_no_correlated_rescan(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS pair compiles to per-order window
    functions over ONE pass of the joined facts: no nested-loop shape,
    and — the regression this pins — each fact table scanned exactly
    once (the agg-then-rejoin form planned the lineitem×orders join
    twice, doubling the 100 TB scan)."""
    plan = plan_of(SPECS["tpch_q21_waiting_suppliers"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("lineitem.parquet") == 1, "lineitem scanned more than once"
    assert plan.count("orders.parquet") == 1, "orders scanned more than once"


def test_sequence_packing_prefix_sum_is_blocked(spark, sf_dir):
    """The packing cumsum must window over (lang, block) — bounded
    64-row partitions — with the block-offset table broadcast back.
    A window partitioned by lang alone is the global-prefix-sum
    anti-pattern: one partition per language regardless of cluster
    size. The regex pins the per-doc window's partition spec to BOTH
    keys."""
    plan = plan_of(SPECS["sequence_packing"].spark(spark, sf_dir))
    assert re.search(r"windowspecdefinition\(lang#\d+, block#\d+", plan), (
        "per-doc cumsum window is not partitioned by (lang, block)"
    )
    assert "BroadcastHashJoin" in plan, "block-offset table should broadcast back"
    # Both prefix-sum branches must read ONE exchange: a single text
    # scan and a single tokenizer evaluation in the executed plan.
    xplan = executed_plan_of(SPECS["sequence_packing"].spark(spark, sf_dir))
    assert xplan.count("documents.parquet") == 1, "corpus scanned more than once"
    assert "ReusedExchange" in xplan, "prefix-sum branches no longer share the exchange"


def test_train_split_is_map_only_plus_one_agg_shuffle(spark, sf_dir):
    """The hash split is stateless: the whole query must be one scan →
    codegen projection → partial agg → single exchange of (split, lang)
    counters → final agg. More than one exchange means the split
    stopped being map-only."""
    plan = plan_of(SPECS["train_val_test_split"].spark(spark, sf_dir))
    # one Exchange node == two textual hits in a formatted plan (tree
    # line + detail header); AdaptiveSparkPlan contributes none.
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, "split should shuffle only 15 counter rows"
    assert "Join" not in plan


def test_corpus_ngram_topk_is_topk_not_sort(spark, sf_dir):
    plan = plan_of(SPECS["corpus_ngram_topk"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "top-20 should be a top-k, not a global sort"


def test_contamination_split_filters_push_below_explode(spark, sf_dir):
    """Each branch of the contamination scan must shingle ONLY its own
    split's documents: the md5-split predicate is a pure function of
    doc_id, so it must reach the scans as a DataFilter (the train
    branch never explodes test docs and vice versa). If the filters
    stay above the Generate, both branches tokenize the full corpus —
    2× the work and growing with every additional split."""
    plan = executed_plan_of(SPECS["ngram_contamination"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # Both branch scans carry the pushed md5-CASE predicate
    # (DataFilters renders only in the executed plan string).
    assert plan.count("DataFilters: [CASE WHEN (substring(md5(") >= 2, (
        "split predicates did not push below the explode to the scans"
    )


def test_stratified_sample_uses_window_group_limit(spark, sf_dir):
    """The per-stratum hash-rank sample must plan as WindowGroupLimit
    (per-partition top-k heaps before the final window) — without it
    every stratum's full membership sorts through the window."""
    plan = plan_of(SPECS["stratified_sample_per_lang"].spark(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_tfidf_leaves_df_join_to_aqe(spark, sf_dir):
    """tf-idf's df table is the corpus VOCABULARY — unbounded at scale
    (Heaps' law) — so it must carry NO explicit broadcast hint: a hint
    bypasses autoBroadcastJoinThreshold and forces a multi-GB
    broadcast at 100 TB. AQE still broadcasts the 2k-term table at
    test scale (zero local cost) and falls back to sort-merge when df
    outgrows the threshold. The only hint allowed is the 1-row corpus
    count."""
    df = SPECS["tfidf_top_terms"].spark(spark, sf_dir)
    hints = []
    _collect_broadcast_hints(df._jdf.queryExecution().analyzed(), hints)
    for h in hints:
        bad: set = set()
        _unbounded_big_tables(h, bad)
        assert not bad, f"broadcast hint covers unbounded side(s): {sorted(bad)}"
    plan = plan_of(df)
    # AQE still picks broadcast at fixture scale — the join strategy is
    # now threshold-governed, not forced.
    assert "BroadcastHashJoin" in plan, "df should still auto-broadcast at test scale"
    assert "CartesianProduct" not in plan
    # the only nested loop allowed is the 1-row count crossJoin
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    # df derives FROM the tf table (ReusedExchange), so only one scan
    # reads text — the corpus-count scan reads zero columns.
    xplan = executed_plan_of(SPECS["tfidf_top_terms"].spark(spark, sf_dir))
    assert "ReusedExchange" in xplan, "df branch re-derives tf instead of reusing it"
    text_scans = [
        s for s in re.findall(r"ReadSchema: struct<([^>]*)>", xplan) if "text" in s
    ]
    assert len(text_scans) == 1, f"text column scanned {len(text_scans)} times"


def test_q18_single_lineitem_scan(spark, sf_dir):
    """Q18's HAVING aggregate IS the output measure; the SQL shape's
    outer re-aggregation must not reappear (it joins raw lineitem a
    second time and re-sums the same lines)."""
    plan = plan_of(SPECS["tpch_q18_large_volume_customers"].spark(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, "lineitem scanned more than once"
    assert "TakeOrderedAndProject" in plan


def test_gap_fill_aggregates_before_grid(spark, sf_dir):
    """Gap-fill must collapse events to (type, hour) aggregates before
    any grid work: one events scan feeding both the hourly aggregate
    and its bounds (ReusedExchange), never a per-event grid join."""
    plan = executed_plan_of(SPECS["hourly_gap_fill_forward"].spark(spark, sf_dir))
    assert plan.count("events.parquet") == 1, "events scanned more than once"
    assert "ReusedExchange" in plan, "bounds re-derive the hourly aggregate"
    assert "CartesianProduct" not in plan


def test_doc_repetition_is_map_only(spark, sf_dir):
    """doc_repetition_score's statistics are array-local (sorted-run
    scan + array_distinct): the plan must carry NO hash shuffle — the
    previous explode → groupBy(doc_id, tok) form shuffled ~one row per
    corpus token. The only allowed exchange is spread()'s round-robin
    (a no-op once the input has enough splits)."""
    plan = plan_of(SPECS["doc_repetition_score"].spark(spark, sf_dir))
    assert "hashpartitioning" not in plan, "per-token shuffle crept back in"
    assert "Generate" not in plan, "explode crept back in"


def test_q2_window_min_single_pass(spark, sf_dir):
    """Q2's correlated min-per-part compiles to a window min over ONE
    pass of the Europe-filtered partsupp rows: lineitem (the partsupp
    source) scanned exactly once, no per-row subquery shape, and the
    top-100 is a top-k, not a global sort."""
    plan = executed_plan_of(SPECS["tpch_q2_min_cost_supplier"].spark(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, "partsupp derivation scanned twice"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q11_shares_scoped_subtree(spark, sf_dir):
    """Q11's per-part aggregate and global total both read the
    nation-scoped value rows: the subtree must be computed once
    (ReusedExchange) with a single lineitem scan; the global total
    rides back as a 1-row broadcast crossJoin (the only nested loop
    allowed)."""
    plan = executed_plan_of(SPECS["tpch_q11_important_stock"].spark(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, "scoped subtree re-derived partsupp"
    assert "ReusedExchange" in plan, "per-part agg and total no longer share the scope"
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_q16_not_in_is_anti_join(spark, sf_dir):
    """Q16's NOT IN (non-null key) must compile to a LEFT ANTI join
    with the part filters pushed to the part scan."""
    plan = plan_of(SPECS["tpch_q16_supplier_cnt"].spark(spark, sf_dir))
    assert "LeftAnti" in plan, "NOT IN did not become an anti join"
    assert "Not(EqualTo(p_brand,Brand#21))" in plan, "brand filter not pushed"


def test_q20_correlated_sum_aggregates_once(spark, sf_dir):
    """Q20's correlated per-pair quantity sum is ONE aggregate of the
    year-filtered lineitem (plus the partsupp derivation scan — two
    lineitem scans total, the inherent cost of deriving partsupp
    inline; at scale partsupp is materialized). No nested-loop shape;
    the part IN-list is a semi join."""
    plan = executed_plan_of(SPECS["tpch_q20_promotion_suppliers"].spark(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 2, "extra lineitem rescan crept in"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan, "IN subqueries should compile to semi joins"


# --- no-sf-proportional-broadcast-hint sweep -------------------------------
#
# An explicit F.broadcast hint BYPASSES autoBroadcastJoinThreshold, so a
# hint on a side whose cardinality grows with scale factor (customer /
# supplier / part / orders / lineitem / documents / raw embeddings)
# becomes a multi-GB forced broadcast at real scale — driver/executor
# OOM, the textbook scale-killer. Hints are allowed ONLY on sides that
# are bounded at ANY scale: nation/region, post-aggregation tables
# (block offsets, per-group stats, scalar aggregates, vocabulary df),
# driver-side LocalRelations (trained centroids), and fixed-ID vector
# slices (probes / hyperplanes / the declared all-pairs scaffolding).
# This test walks the ANALYZED logical plan of every batch catalog
# query: for each ResolvedHint(broadcast) subtree, every path to an
# sf-proportional base relation must pass through a bounding node.

_HINT_BOUNDING_NODES = {
    # nodes whose output cardinality does not scale with their input
    # REGARDLESS of shape. Aggregate/Deduplicate are NOT here: an
    # aggregate grouped by an unbounded key (term → vocabulary,
    # doc_id, …) scales with the corpus (Heaps' law) — the r5 lint's
    # blanket Aggregate exemption was exactly the hole tfidf's
    # vocabulary-sized broadcast rode through. They bound only when
    # their keys are a declared bounded-domain set (checked below).
    "GlobalLimit",
    "LocalRelation",    # driver-side constants (trained centroids)
    "OneRowRelation",
    "Range",
}

# Grouping/dedup key columns whose value domain is bounded at ANY
# scale factor: dimension keys (nation/region), closed enums
# (event_type, lang, source, split, TPC-H flags), IVF cell ids
# (≤ k centroids), and `block` — bounded by construction because
# packed_docs raises at runtime when the block-offset table would
# exceed its max_blocks cap (the guard is itself pytest-pinned), so
# a broadcast over a block-grouped aggregate can never exceed
# max_blocks rows.
_HINT_BOUNDED_KEY_COLUMNS = {
    "n_nationkey", "n_name", "n_regionkey",
    "r_regionkey", "r_name",
    "event_type", "lang", "source", "split",
    "l_returnflag", "l_linestatus", "o_orderpriority", "o_orderstatus",
    "cid", "pcid", "block",
    # embedding dimension index (posexplode position over the fixed
    # 64-dim vectors) — an aggregate keyed by it emits ≤ 64 rows
    # (hybrid_rrf_retrieval's pseudo-relevance centroid). Named
    # emb_dim, not the generic "dim", so an unrelated future column
    # cannot ride this exemption (ADVICE r9).
    "emb_dim",
}

_KEY_ATTR = re.compile(r"(\w+)#\d+")


def _keys_bounded(keys_str: str) -> bool:
    """True iff every attribute referenced by the grouping/dedup keys
    is in the declared bounded-domain set. An empty key list (scalar
    aggregate — 1 output row) is trivially bounded."""
    return all(n in _HINT_BOUNDED_KEY_COLUMNS for n in _KEY_ATTR.findall(keys_str))

# fixed-ID slices of the embeddings table (probes, hyperplanes,
# centroid seeds, the declared 300-vector all-pairs scaffolding): a
# literal equality/membership/upper-bound on vec_id fixes cardinality.
_HINT_BOUNDED_FILTER = re.compile(r"vec_id#\d+L?( as bigint\))? (IN \(|<=? |= )")

_SF_PROPORTIONAL_MARKERS = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "l_linenumber": "lineitem",
    "doc_id": "documents",
    "embedding#": "embeddings",
}


def _jchildren(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _collect_broadcast_hints(node, acc):
    if node.getClass().getSimpleName() == "ResolvedHint" and "broadcast" in node.hints().toString().lower():
        acc.append(node)
    for k in _jchildren(node):
        _collect_broadcast_hints(k, acc)


def _unbounded_big_tables(node, acc):
    cls = node.getClass().getSimpleName()
    if cls in _HINT_BOUNDING_NODES:
        return
    if cls == "Aggregate":
        keys_str = node.groupingExpressions().toString()
        if _keys_bounded(keys_str):
            return  # scalar aggregate or bounded-domain grouping keys
        # r9: grouping keys pinned to a LITERAL IN set by a filter
        # below the aggregate are bounded too — the aggregate emits at
        # most |literals| rows regardless of corpus size
        # (keyword_search_topk's 3-term df table).
        keys = _KEY_ATTR.findall(keys_str)
        sub = node.toString()
        if keys and all(
            re.search(rf"{re.escape(n)}#\d+L? IN \(", sub) for n in keys
        ):
            return
    if cls == "Deduplicate" and _keys_bounded(node.keys().toString()):
        return
    if cls == "Filter" and _HINT_BOUNDED_FILTER.search(node.condition().toString()):
        return
    kids = _jchildren(node)
    if not kids:
        leaf = node.toString()
        for marker, table in _SF_PROPORTIONAL_MARKERS.items():
            if marker in leaf:
                acc.add(table)
        return
    for k in kids:
        _unbounded_big_tables(k, acc)


# Several queries EXECUTE Spark jobs at DataFrame build time (driver-
# probed sketches, iterative CC loops, checkpoint-pinned derivations).
# The two catalog-wide lints below both need every query's DataFrame,
# so they share ONE build per query per session instead of paying the
# eager work twice.
_BUILT_DF_CACHE: dict = {}


def _built_df(name, spark, sf_dir):
    if name not in _BUILT_DF_CACHE:
        _BUILT_DF_CACHE[name] = SPECS[name].spark(spark, sf_dir)
    return _BUILT_DF_CACHE[name]


def test_no_broadcast_hint_on_sf_proportional_side(spark, sf_dir):
    violations = []
    for name, spec in SPECS.items():
        if name.startswith("streaming_"):
            continue  # streaming fns execute a stream to build their result
        df = _built_df(name, spark, sf_dir)
        hints = []
        _collect_broadcast_hints(df._jdf.queryExecution().analyzed(), hints)
        for h in hints:
            bad: set = set()
            _unbounded_big_tables(h, bad)
            for table in sorted(bad):
                violations.append(f"{name}: broadcast hint covers unbounded {table}")
    assert not violations, (
        "explicit F.broadcast on sf-proportional sides (forces a GB-scale "
        "broadcast at 100 TB, bypassing autoBroadcastJoinThreshold):\n  "
        + "\n  ".join(violations)
    )


def test_hint_lint_rejects_unbounded_key_aggregate(spark, sf_dir):
    """Regression lock for the lint ITSELF: r5's blanket Aggregate
    exemption let tfidf's vocabulary-sized df broadcast through. The
    tightened lint must flag a broadcast hint over an aggregate grouped
    by an unbounded key (term), while still admitting a scalar
    aggregate and a bounded-domain grouping (lang)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from currency_etl_pipeline_spark.queries.text import exploded, tokens

    ex = exploded(docs, ["doc_id"], tokens(), "term")
    vocab_sized = ex.groupBy("term").count()  # |vocabulary| rows — unbounded

    def flagged(df):
        hints: list = []
        _collect_broadcast_hints(df._jdf.queryExecution().analyzed(), hints)
        assert hints, "test setup: no hint found"
        bad: set = set()
        for h in hints:
            _unbounded_big_tables(h, bad)
        return bad

    # The exact pre-fix tfidf shape: hint over a term-grouped aggregate.
    assert flagged(ex.join(F.broadcast(vocab_sized), "term")) == {"documents"}
    # Scalar aggregate stays admissible.
    assert flagged(ex.crossJoin(F.broadcast(docs.agg(F.count(F.lit(1)).alias("n"))))) == set()
    # Bounded-domain grouping stays admissible.
    langs = load_table(spark, sf_dir, "documents").groupBy("lang").count()
    assert flagged(
        load_table(spark, sf_dir, "documents").join(F.broadcast(langs), "lang")
    ) == set()


# Queries ALLOWED to plan a CartesianProduct — each a declared
# fixed-size scaffolding slice, never a corpus-scale cross join.
_CARTESIAN_ALLOWED = {
    "near_dup_embeddings",  # declared all-pairs baseline on a fixed 300-vector slice
}


def test_no_catalog_query_plans_a_cartesian_product(spark, sf_dir):
    """Catalog-wide lint: no query's physical plan may contain a
    CartesianProduct (the quadratic scale-killer) unless it is on the
    declared-scaffolding allowlist. Broadcast nested loops are allowed
    (the 1-row scalar / bounded-probe crossJoins are legitimate);
    Cartesian means BOTH sides were too big to broadcast — at real
    scale that is always a bug."""
    offenders = []
    for name, spec in SPECS.items():
        if name.startswith("streaming_") or name in _CARTESIAN_ALLOWED:
            continue
        plan = plan_of(_built_df(name, spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"CartesianProduct planned by: {offenders}"


def test_max_partition_bytes_controls_scan_parallelism(spark):
    """The knob the 100 TB sizing notes lean on: a single large file
    must split into multiple input partitions when
    spark.sql.files.maxPartitionBytes shrinks below the file size —
    the difference between one core and the whole cluster scanning a
    fat file. (openCostInBytes is lowered too so tiny split packing
    doesn't mask the effect.)"""
    import os

    from tests.conftest import SF_DIR

    path = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.1", "lineitem.parquet")
    if not os.path.exists(path):
        import pytest as _pytest

        _pytest.skip(f"no sf0.1 testdata next to {SF_DIR}")
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        wide = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        narrow = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)
    assert narrow > wide, f"1MB splits gave {narrow} partitions vs {wide} at 128MB"
    assert narrow >= 4, f"a multi-MB file should yield several 1MB splits, got {narrow}"


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Runtime bloom-filter join reduction: with a selective dim and a
    non-broadcastable plan, the optimizer must inject a bloom_filter_agg
    on the dim side and a might_contain pre-filter on the FACT side —
    at 100 TB this discards most fact rows before the shuffle, the
    sort-merge-join equivalent of DPP. Thresholds are forced to the
    big-data regime (tiny testdata never crosses the real defaults)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        ev = load_table(spark, sf_dir, "events")
        dim = (
            load_table(spark, sf_dir, "customer")
            .filter(F.col("c_nationkey") == 3)
            .select(F.col("c_custkey").alias("user_id"))
        )
        j = ev.join(dim, "user_id")
        plan = plan_of(j)
        assert "bloom_filter_agg" in plan, "no bloom filter built on the dim side"
        assert "might_contain" in plan, "fact side not pre-filtered by the bloom filter"
        j.count()  # the filtered plan must still execute cleanly
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_int8_rerank_recall(spark, sf_dir):
    """int8-quantized scan + exact top-30 re-rank must recover nearly
    all of the exact cosine top-10 (measured 1.0 on the testdata at
    sf0.001 and sf0.01; 0.9 floor catches a broken quantizer or a
    candidate pool that stopped covering the true neighbors)."""
    exact = {
        (r["query_id"], r["vec_id"])
        for r in SPECS["cosine_topk_bruteforce"].spark(spark, sf_dir).collect()
    }
    q8 = {
        (r["query_id"], r["vec_id"])
        for r in SPECS["ann_int8_rerank_topk"].spark(spark, sf_dir).collect()
    }
    assert len(exact) == 30 and len(q8) == 30
    recall = len(q8 & exact) / len(exact)
    assert recall >= 0.9, f"int8 re-rank recall collapsed: {recall:.3f}"


def test_passage_dedup_rewrite_nonvacuous(spark, sf_dir):
    """The rewrite must actually drop duplicated passages (the corpus
    plants near-dup docs sharing 16-word chunks) while keeping every
    document present, total passage accounting exact, and the first
    occurrence of every distinct passage intact."""
    rows = SPECS["passage_dedup_rewrite"].spark(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    dropped = sum(r["n_passages"] - r["n_kept"] for r in rows)
    assert dropped > 0, "no duplicate passages dropped — rewrite is vacuous"
    assert all(r["n_kept"] <= r["n_passages"] for r in rows)
    # Conservation: distinct passages across the corpus == total kept.
    kept_total = sum(r["n_kept"] for r in rows)
    from currency_etl_pipeline_spark.queries.llm_prep import _PASSAGE_PAT

    distinct = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.regexp_extract_all(
                    F.trim(F.coalesce(F.col("text"), F.lit(""))), F.lit(_PASSAGE_PAT), 0
                )
            ).alias("p")
        )
        .agg(F.countDistinct("p"))
        .collect()[0][0]
    )
    assert kept_total == distinct


def test_perplexity_lm_single_scan_and_bounded_vocab(spark, sf_dir):
    """The unigram-LM scorer must (a) scan the corpus ONCE — the tf
    table feeds both the LM-fitting branch and the scoring join via
    ReusedExchange, (b) select the vocabulary with a distributed top-V
    (TakeOrderedAndProject), never a global sort, and (c) actually
    split the corpus at the keep threshold (non-vacuous gate)."""
    df = SPECS["perplexity_quality_score"].spark(spark, sf_dir)
    plan = executed_plan_of(df)
    assert plan.count("FileScan parquet") == 1, "corpus scanned more than once"
    assert "ReusedExchange" in plan, "tf exchange not shared between LM and scoring"
    assert "TakeOrderedAndProject" in plan, "vocab cap planned as a global sort"
    rows = df.collect()
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < len(rows), f"keep gate is vacuous: {kept}/{len(rows)}"
    assert any(r["n_oov"] > 0 for r in rows), "OOV bucket never exercised"


def test_skew_profile_is_topk_not_global_sort(spark, sf_dir):
    plan = plan_of(SPECS["join_key_skew_profile"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "hot-key top-20 planned as a global sort"


def test_no_row_at_a_time_python_udfs_anywhere(spark, sf_dir):
    """Catalog-wide lint: Python may appear in a plan only Arrow-batched
    (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas / pandas
    UDAFs) or as a declared UDTF — never as a row-at-a-time
    BatchEvalPython, which serializes one row per Python call and is
    the 10-100x slow path the repo bans in hot paths."""
    offenders = []
    for name in SPECS:
        if name.startswith("streaming_"):
            continue  # streaming fns execute a stream to build their result
        plan = plan_of(_built_df(name, spark, sf_dir))
        for line in plan.splitlines():
            if "BatchEvalPython" in line and "UDTF" not in line:
                offenders.append(f"{name}: {line.strip()[:120]}")
    assert not offenders, (
        "row-at-a-time Python UDF planned (use pandas_udf / mapInPandas):\n  "
        + "\n  ".join(offenders)
    )


def test_ivf_index_search_prunes_and_matches_inplan_ivf(spark, sf_dir, tmp_path):
    """The materialized IVF index must (a) prune: searching reads ONLY
    the probed cid partitions — unprobed cells' files are never opened
    (inputFiles + PartitionFilters both checked), and (b) agree row-for-
    row with the one-plan ivf_ann_topk query (same centroids, probes,
    tie-breaks)."""
    import re

    from currency_etl_pipeline_spark.queries.advanced import (
        _IVF_QUERY_IDS,
        CENTROID_IDS,
    )
    from currency_etl_pipeline_spark.sources.ann_index import (
        build_ivf_index,
        search_ivf_index,
    )

    idx = str(tmp_path / "ivf_index")
    build_ivf_index(spark, sf_dir, idx, CENTROID_IDS)
    all_cids = {
        re.search(r"cid=(\d+)", f).group(1)
        for f in spark.read.parquet(idx).inputFiles()
    }
    assert len(all_cids) > 2, "index degenerated into <3 cells"

    res = search_ivf_index(
        spark, sf_dir, idx, _IVF_QUERY_IDS, CENTROID_IDS, nprobe=2, k=5
    )
    got = sorted(map(tuple, res.collect()))
    expect = sorted(map(tuple, SPECS["ivf_ann_topk"].spark(spark, sf_dir).collect()))
    assert got == expect, "index search diverged from the in-plan IVF query"

    # Pruning: the literal cid IN-list must reach the scan as a
    # PARTITION filter (listing-time pruning) and cover strictly fewer
    # cells than the index holds. (inputFiles() can't be used here —
    # it lists the relation's files ignoring pushed filters.)
    m = re.search(r"PartitionFilters: \[[^\]]*cid#\d+ IN \(([\d,]+)\)", plan_of(res))
    assert m, "cid filter did not reach the scan as a partition IN filter"
    probed = set(m.group(1).split(","))
    assert probed < all_cids, (
        f"probed {sorted(probed)} of {sorted(all_cids)} — nothing pruned"
    )


def test_ivf_sq8_index_full_probe_equals_int8_rerank_query(spark, sf_dir, tmp_path):
    """The int8-coded IVF index, probed over ALL cells, must reproduce
    ann_int8_rerank_topk bit-for-bit (same quantizer, candidate pool,
    re-rank and tie-breaks — only the storage layout differs); with
    nprobe=2 the scan must prune partitions and still return k rows per
    query."""
    import re

    from currency_etl_pipeline_spark.queries.advanced import (
        _IVF_QUERY_IDS,
        CENTROID_IDS,
    )
    from currency_etl_pipeline_spark.sources.ann_index import (
        build_ivf_sq8_index,
        search_ivf_sq8_index,
    )

    idx = str(tmp_path / "ivf_sq8")
    build_ivf_sq8_index(spark, sf_dir, idx, CENTROID_IDS)

    full = search_ivf_sq8_index(
        spark, sf_dir, idx, _IVF_QUERY_IDS, CENTROID_IDS, nprobe=8, k=10, rerank=30
    )
    got = sorted(map(tuple, full.collect()))
    expect = sorted(
        map(tuple, SPECS["ann_int8_rerank_topk"].spark(spark, sf_dir).collect())
    )
    assert got == expect, "sq8 index search diverged from the in-plan int8 query"

    pruned = search_ivf_sq8_index(
        spark, sf_dir, idx, _IVF_QUERY_IDS, CENTROID_IDS, nprobe=2, k=10, rerank=30
    )
    m = re.search(r"PartitionFilters: \[[^\]]*cid#\d+ IN \(([\d,]+)\)", plan_of(pruned))
    assert m and len(m.group(1).split(",")) < 8, "sq8 search did not prune cells"
    rows = pruned.collect()
    assert len(rows) == 10 * len(_IVF_QUERY_IDS)
    assert all(-1.000001 <= r["qcos_sim"] <= 1.000001 for r in rows)


def test_quantize_int8_code_semantics(spark):
    """The quantizer's codes must be what int8 means — integers in
    [-127, 127], the max-|x| element mapping to ±127, sign preserved,
    and quantized cosine within 2% of exact — checked directly, because
    the oracle twin mirrors the same formula and would co-sign a
    systematically wrong one."""
    import math

    from currency_etl_pipeline_spark.queries.vectors import cosine, quantize_int8

    vecs = [
        (0, [1.0, -0.5, 0.25, 0.125]),
        (1, [-2.0, 2.0, 0.0, 1.0]),
        (2, [0.003, -0.001, 0.002, 0.0005]),
    ]
    df = spark.createDataFrame(vecs, "vec_id int, v array<double>").select(
        "vec_id", "v", quantize_int8(F.col("v")).alias("q")
    )
    rows = {r["vec_id"]: r for r in df.collect()}
    for vid, v in vecs:
        q = rows[vid]["q"]
        assert all(c == int(c) and -127 <= c <= 127 for c in q), q
        mx_i = max(range(len(v)), key=lambda i: abs(v[i]))
        assert abs(q[mx_i]) == 127, f"max-|x| element must hit ±127: {q}"
        assert all(
            (c == 0) or (c > 0) == (x > 0) for c, x in zip(q, v)
        ), f"sign flipped: {v} -> {q}"

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    pairs = df.alias("a").crossJoin(df.alias("b")).filter(F.col("a.vec_id") < F.col("b.vec_id"))
    got = pairs.select(
        "a.vec_id", "b.vec_id", cosine(F.col("a.q"), F.col("b.q")).alias("qcos")
    ).collect()
    for r in got:
        exact = cos(dict(vecs)[r[0]], dict(vecs)[r[1]])
        assert abs(r["qcos"] - exact) < 0.02, (r[0], r[1], r["qcos"], exact)


def test_shard_token_id_streams_windows_never_shuffle_arrays(spark, sf_dir):
    """The learned-tokenizer shard stream's scale argument (r12): the
    packer runs the SAME blocked two-level prefix sum as
    sequence_packing — windows over (lang, block), offsets broadcast
    back — and the token-ID ARRAYS never enter that window machinery;
    only the final (lang, shard_id) concat shuffle may carry them
    (that shuffle IS the shard assembly). A refactor that threads
    token_ids through the packer would silently turn every prefix-sum
    exchange into a corpus-width shuffle."""
    df = SPECS["shard_token_id_streams"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert re.search(r"windowspecdefinition\(lang#\d+, block#\d+", plan), (
        "per-doc cumsum window is not partitioned by (lang, block)"
    )
    assert "BroadcastHashJoin" in plan, "block-offset table should broadcast back"
    # Every window's input exchange must be array-free: the formatted
    # plan prints each Exchange's input schema in its detail block.
    packer_exchanges = [
        m.group(1)
        for m in re.finditer(
            r"\(\d+\) Exchange[^\n]*\nInput \[[^\]]*\]: \[([^\]]+)\]", plan
        )
        if "block#" in m.group(1)  # the packer's exchanges carry the block key
    ]
    assert packer_exchanges, "regex stopped matching the packer's exchanges (vacuous)"
    for cols in packer_exchanges:
        assert "token_ids" not in cols, (
            "prefix-sum exchange carries the id arrays: " + cols
        )
    assert "CartesianProduct" not in plan


def test_contamination13_split_filters_push_below_explode(spark, sf_dir):
    """Same guarantee as the bigram demonstrator, for the published
    13-gram protocol: the md5-split predicate must reach BOTH branch
    scans so each branch windows only its own split's documents."""
    plan = executed_plan_of(SPECS["contamination_13gram"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("DataFilters: [CASE WHEN (substring(md5(") >= 2, (
        "split predicates did not push below the explode to the scans"
    )


def test_contamination_family_exchanges_are_digest_only(spark, sf_dir):
    """The r14 rolling upgrade's scale claim for the contamination
    template: every exchange in the inverted-index path carries 8-byte
    gram longs (plus doc ids), never the text column — and the window
    identities come from the xxhash64-fed rolling device, with no
    per-window md5 (string materialization) anywhere in the plan."""
    import re as _re

    for name in ("contamination_13gram", "ngram_contamination"):
        plan = plan_of(SPECS[name].spark(spark, sf_dir))
        assert "xxhash64" in plan, f"{name}: rolling token-hash device missing"
        ex = _re.findall(
            r"\(\d+\) (?:Exchange|BroadcastExchange)[^\n]*\nInput \[[^\]]*\]: \[([^\]]+)\]",
            plan,
        )
        gram_ex = [cols for cols in ex if _re.search(r"\bgram#\d+", cols)]
        assert gram_ex, f"{name}: gram exchange not found (regex went vacuous)"
        for cols in gram_ex:
            assert "text#" not in cols, f"{name}: gram exchange carries text: {cols}"


def test_subpassage_decisions_travel_as_digests(spark, sf_dir):
    """subpassage_dedup_rewrite's scale claim: the dedup decision
    pipeline shuffles (doc_id, widx, md5) digest rows only — no
    exchange in the digest path may carry the text column — and the
    per-doc span lists BROADCAST back to the rewrite join (in the
    no-broadcast regime that join degrades to the one text shuffle
    passage_dedup_rewrite pays, never more)."""
    import re as _re

    df = SPECS["subpassage_dedup_rewrite"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    # r14 rolling upgrade: window identities come from xxhash64-fed
    # polynomial chains; no per-window md5 (and hence no materialized
    # window string as its argument) may appear anywhere in the plan.
    assert "xxhash64" in plan, "rolling token-hash device missing from the plan"
    assert "md5" not in plan, "a per-window md5 (string materialization) is back"
    ex = _re.findall(
        r"\(\d+\) (Exchange|BroadcastExchange)[^\n]*\nInput \[[^\]]*\]: \[([^\]]+)\]",
        plan,
    )
    digest_ex = [cols for kind, cols in ex if _re.search(r"\bh#\d+", cols)]
    assert digest_ex, "digest exchange not found (regex went vacuous)"
    for cols in digest_ex:
        assert "text#" not in cols, "digest-path exchange carries the corpus: " + cols
    assert any(
        kind == "BroadcastExchange" and "spans#" in cols for kind, cols in ex
    ), "span lists no longer broadcast back to the rewrite join"


def test_grouped_map_python_stages_stay_parallel(spark, sf_dir):
    """r15: AQE's byte-based coalescing must never fold the shuffle
    feeding a grouped-map Python stage back to one partition (it did —
    every per-group call then runs serially in a single worker; the
    fix is the explicit repartition(defaultParallelism, keys), which
    is REPARTITION_BY_NUM and exempt from coalescing). Pin the runtime
    partition count of both fixed queries at defaultParallelism."""
    par = spark.sparkContext.defaultParallelism
    for name in ("user_gap_stats", "shard_token_streams"):
        df = SPECS[name].spark(spark, sf_dir)
        got = df.rdd.getNumPartitions()
        assert got == par, f"{name}: python stage runs {got} partitions, want {par}"
