"""Advanced analytics: sessionization, exact percentiles, ranking
functions, time-range joins, IVF-style ANN, and skew-salted plans.

These extend the reference's degenerate query surface (top-1/LIMIT-N,
SURVEY.md §2.E-§2.G) to the full window/aggregate/join families a
100 TB training-data pipeline needs. Each query's plan note says why
it survives scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.functions.scalars import dec, ts_str
from currency_etl_pipeline_spark.operators.skew import salted_aggregate, salted_join
from currency_etl_pipeline_spark.operators.topk import top_k_per_group
from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.tables import load_table
from currency_etl_pipeline_spark.queries.vectors import _vecs, cosine, _COS_DUCK

TS_DUCK = "strftime({c}, '%Y-%m-%d %H:%M:%S.%f')"


@query(
    "event_sessionization",
    oracle=f"""
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
    SELECT user_id, {TS_DUCK.format(c="min(ts)")} AS session_start,
           count(*) AS n_events,
           CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
)
def event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via the native
    ``session_window`` aggregate — per-user sessions with event count
    and value sum. The oracle is the classic lag/flag/cumsum rewrite
    (new session when the gap is STRICTLY > 30 min: session_window
    merges an event landing exactly at last_ts + gap — probed
    empirically, r10 — so the oracle's split predicate must be >, not
    >=; at sf0.1 one gap sits exactly on the boundary and the >= form
    diverges by one session).

    Plan: ONE shuffle on user_id; session merging is in-partition
    state, no self-join — the sessionization that scales to a 100 TB
    event log (and runs unchanged under Structured Streaming with a
    watermark, streaming/pipeline.py).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
            F.min("ts").alias("start_ts"),
        )
        .select("user_id", ts_str("start_ts").alias("session_start"), "n_events", "sum_value")
    )


@query(
    "lineitem_percentiles",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def lineitem_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90/p99) per return flag
    — the distribution summary surface (no literal percentile exists in
    the reference; implied by "historical trends", README.md:106).

    Uses exact ``percentile`` (linear interpolation, same definition as
    the oracle's quantile_cont). At 100 TB swap to
    ``approx_percentile`` (t-digest, mergeable partial aggregation) —
    same call shape, bounded memory; the exact form here is what makes
    the oracle check possible.

    r15 optimization: the two percentiles per column are one
    ``percentile(col, array(q1, q2))`` call — exact percentile buffers
    EVERY group value per aggregate expression, so four scalar calls
    built four copies of the per-group value buffer where two array
    calls build two (same interpolation, bit-identical output; at
    100 TB the aggregation state halves). Measured at sf0.1:
    1.69 s → 1.01 s min-of-4, identical rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(l_quantity, array(0.5, 0.9))").alias("pq"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.99))").alias("pp"),
    )
    return g.select(
        "l_returnflag",
        "n",
        F.round(F.col("pq")[0], 6).alias("median_qty"),
        F.round(F.col("pq")[1], 6).alias("p90_qty"),
        F.round(F.col("pp")[0], 4).alias("median_price"),
        F.round(F.col("pp")[1], 4).alias("p99_price"),
    )


@query(
    "lineitem_percentiles_approx",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           true AS median_qty_ok, true AS p90_qty_ok,
           true AS median_price_ok, true AS p99_price_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def lineitem_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of ``lineitem_percentiles``: same call shape,
    ``approx_percentile`` instead of exact ``percentile`` — surfaced
    as a BOUND VERDICT so the row hash-checks (VERDICT r9 task 3).
    The sketch's raw answers are accuracy-bounded, not bitwise
    engine-portable, so the output carries the exact group count n
    plus one boolean per percentile asserting the sketch's rank-error
    contract: the returned element's rank interval
    [#{v < x} + 1, #{v <= x}] must intersect
    [q·n − eps·n, q·n + eps·n] with eps = 1/accuracy (+1 row of edge
    slack) — checked in-engine against a literal-true oracle.

    Plan: exact percentile buffers every group value in the aggregation
    state (unbounded memory per group at 100 TB); approx_percentile
    keeps a fixed-size quantile sketch per group that merges
    associatively across partials — partial aggregation (map-side
    combine) applies and executor memory is bounded regardless of group
    cardinality. accuracy=10000 bounds rank error at 1/10000 of the
    group size. The verdict pass is a SECOND scan joining the 3-row
    broadcast sketch output back to lineitem for the conditional rank
    counts — the cost of grading the sketch, not of using it; the
    production call shape is the first aggregate alone.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    apx = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("median_qty"),
        F.expr("approx_percentile(l_quantity, 0.9, 10000)").alias("p90_qty"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("median_price"),
        F.expr("approx_percentile(l_extendedprice, 0.99, 10000)").alias("p99_price"),
    )
    j = li.join(F.broadcast(apx), "l_returnflag")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    ranks = j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            agg
            for col, tgt in [
                ("l_quantity", "median_qty"),
                ("l_quantity", "p90_qty"),
                ("l_extendedprice", "median_price"),
                ("l_extendedprice", "p99_price"),
            ]
            for agg in (
                cnt(F.col(col) < F.col(tgt)).alias(f"{tgt}_lt"),
                cnt(F.col(col) <= F.col(tgt)).alias(f"{tgt}_le"),
            )
        ],
    )

    def ok(tgt: str, q: float):
        n = F.col("n").cast("double")
        eps_n = n / 10000 + 1
        lo, hi = F.col(f"{tgt}_lt") + 1, F.col(f"{tgt}_le")
        return ((lo <= q * n + eps_n) & (hi >= q * n - eps_n)).alias(f"{tgt}_ok")

    return ranks.select(
        "l_returnflag",
        "n",
        ok("median_qty", 0.5),
        ok("p90_qty", 0.9),
        ok("median_price", 0.5),
        ok("p99_price", 0.99),
    )


@query(
    "order_rank_functions",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume_d,
           nth_value(o_orderkey, 2) OVER w AS second_largest_key
    FROM orders WHERE o_orderkey < 1000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def order_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-family windows (ntile / percent_rank / cume_dist /
    nth_value) over orders per priority — the full §2.G analytic
    surface beyond row_number/lag. Order key (price DESC, orderkey)
    is a total order, so RANGE-frame peer groups are singletons and
    both engines agree bit-for-bit.

    Plan: one shuffle on o_orderpriority; all four functions evaluate
    in a single Window physical node (shared sort).
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_d"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_largest_key"),
    )


@query(
    "purchases_within_1h_before_click",
    oracle=f"""
    SELECT c.event_id AS click_id, c.user_id,
           count(p.event_id) AS n_purchases,
           CAST(coalesce(sum(CAST(p."value" AS DECIMAL(12,2))), 0) AS DOUBLE) AS purchase_value
    FROM events c
    LEFT JOIN events p
      ON p.user_id = c.user_id AND p.event_type = 'purchase'
     AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts
    WHERE c.event_type = 'click'
    GROUP BY c.event_id, c.user_id
    """,
)
def purchases_within_1h_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join: for every click, purchases by the same user in
    the trailing hour — the windowed generalization of the as-of join
    (operators/asof.py) and of the reference's trailing-24h two-query
    shape (fetch_transform_load_dag.py:128-136).

    Plan: the equi-join key is (user_id, hour_bucket) — each click
    probes two buckets (its own hour and the previous one, which cover
    any trailing-1h window), each purchase carries exactly one bucket,
    so every qualifying (click, purchase) pair joins exactly once and
    the exact time bounds are residual predicates. Per-join-key match
    sets are bounded by one user-hour of purchases, not a hot user's
    whole history — the quadratic blowup of the user_id-only join is
    gone, and the 2× click replication is a constant map-side explode.
    Clicks with no purchases survive via the left join (both bucket
    rows dangle; count over them is 0).
    """
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
        .withColumn(
            "bkt",
            F.explode(
                F.array(
                    F.date_trunc("hour", F.col("c_ts")),
                    F.date_trunc("hour", F.col("c_ts")) - F.expr("INTERVAL 1 HOUR"),
                )
            ),
        )
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
        F.date_trunc("hour", F.col("ts")).alias("p_bkt"),
    )
    joined = c.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_bkt") == F.col("bkt"))
        & (F.col("p_ts") >= F.col("c_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("p_ts") <= F.col("c_ts")),
        "left",
    )
    return joined.groupBy("click_id", "user_id").agg(
        F.count("p_id").alias("n_purchases"),
        F.coalesce(F.sum(dec("p_value")), F.lit(0).cast("decimal(12,2)")).cast("double").alias("purchase_value"),
    )


CENTROID_IDS = tuple(range(20, 28))  # 8 deterministic coarse centroids
_IVF_QUERY_IDS = (0, 1, 2)


@query(
    "ivf_ann_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv, label FROM embeddings),
    cents AS (SELECT vec_id - 20 AS cid, dv AS cv FROM v WHERE vec_id BETWEEN 20 AND 27),
    scored AS (
        SELECT v.vec_id, v.label, v.dv, c.cid,
               round({_COS_DUCK.format(a="v.dv", b="c.cv")}, 6) AS csim
        FROM v CROSS JOIN cents c
    ),
    assigned AS (
        SELECT vec_id, label, dv, cid FROM scored
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, dv AS qv, cid FROM scored WHERE vec_id IN (0, 1, 2)
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) <= 2
    )
    SELECT p.query_id, a.vec_id, a.label,
           round({_COS_DUCK.format(a="a.dv", b="p.qv")}, 6) AS cos_sim
    FROM assigned a JOIN probes p ON a.cid = p.cid AND a.vec_id <> p.query_id
    QUALIFY row_number() OVER (PARTITION BY p.query_id
                               ORDER BY cos_sim DESC, a.vec_id ASC) <= 5
    """,
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest of 8
    deterministic centroids (vectors 20..27 — oracle-replayable), then
    search only the query's 2 nearest inverted lists (nprobe=2) with
    exact cosine. Complements ann_lsh_topk: IVF prunes by Voronoi cell,
    LSH by hyperplane signature.

    Plan: assignment is a map-side crossJoin against 8 broadcast
    centroids (O(8n), no shuffle); the candidate search is an equi-join
    on cid — at 100 TB the corpus is written partitioned BY cid, so
    probing nprobe cells is partition pruning, not a join. Real IVF
    trains centroids with k-means (pyspark.ml KMeans fits here
    unchanged); fixed seed vectors keep the oracle exact.
    """
    v = _vecs(spark, sf_dir)
    cents = F.broadcast(
        v.filter(F.col("vec_id").isin(*CENTROID_IDS)).select(
            (F.col("vec_id") - 20).alias("cid"), F.col("v").alias("cv")
        )
    )
    scored = v.crossJoin(cents).select(
        "vec_id", "label", "v", "cid", F.round(cosine(F.col("v"), F.col("cv")), 6).alias("csim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cid").asc())
    ranked = scored.withColumn("rn", F.row_number().over(w))
    assigned = ranked.filter(F.col("rn") == 1).select("vec_id", "label", F.col("v").alias("dv"), "cid")
    probes = F.broadcast(
        ranked.filter(F.col("vec_id").isin(*_IVF_QUERY_IDS) & (F.col("rn") <= 2)).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("cid").alias("pcid")
        )
    )
    cand = assigned.join(
        probes, (F.col("cid") == F.col("pcid")) & (F.col("vec_id") != F.col("query_id"))
    ).select("query_id", "vec_id", "label", F.round(cosine(F.col("dv"), F.col("qv")), 6).alias("cos_sim"))
    return top_k_per_group(
        cand, ["query_id"], [F.col("cos_sim").desc(), F.col("vec_id").asc()], k=5, descending=False
    ).select("query_id", "vec_id", "label", "cos_sim")


def ivf_trained_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained-IVF search surface: (query_id, vec_id, label,
    cos_sim) top-5 per query at nprobe=2 — pyspark.ml KMeans (k=8,
    cosine distance, fixed seed) replaces ``ivf_ann_topk``'s fixed seed
    vectors, so cell populations follow the data distribution instead
    of 8 arbitrary Voronoi sites. The registered
    ``ivf_ann_topk_trained`` query grades this surface against the
    exact brute-force baseline (KMeans centers aren't
    oracle-replayable in SQL, so the SEARCH ROWS can't hash-check —
    the recall VERDICT can); raw recall is additionally pinned in
    tests/test_scale_plans.py::test_ivf_trained_recall so a vacuous
    always-true verdict cannot pass.

    Plan: training is a few passes over an (optionally sampled) corpus;
    assignment = model.transform (map-side, centroids broadcast by ml);
    probe cells per query come from the same tiny centroid table; the
    candidate search is the cid equi-join — written partitioned by cid
    at 100 TB, probing nprobe cells is partition pruning. Same shape as
    ivf_ann_topk; only the centroid source changes.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = _vecs(spark, sf_dir)
    feats = v.select("vec_id", "label", "v", array_to_vector(F.col("v")).alias("features"))
    model = KMeans(k=8, seed=42, distanceMeasure="cosine", maxIter=20).fit(feats)
    assigned = model.transform(feats).select(
        "vec_id", "label", F.col("v").alias("dv"), F.col("prediction").alias("cid")
    )
    # 8 trained centers — a driver-side constant (k floats), broadcast.
    cents = F.broadcast(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "cid int, cv array<double>",
        )
    )
    probes_scored = (
        v.filter(F.col("vec_id").isin(*_IVF_QUERY_IDS))
        .crossJoin(cents)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("cid").alias("pcid"),
            F.round(cosine(F.col("v"), F.col("cv")), 6).alias("csim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("pcid").asc())
    probes = F.broadcast(
        probes_scored.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= 2)
        .select("query_id", "qv", "pcid")
    )
    cand = assigned.join(
        probes, (F.col("cid") == F.col("pcid")) & (F.col("vec_id") != F.col("query_id"))
    ).select(
        "query_id", "vec_id", "label", F.round(cosine(F.col("dv"), F.col("qv")), 6).alias("cos_sim")
    )
    return top_k_per_group(
        cand, ["query_id"], [F.col("cos_sim").desc(), F.col("vec_id").asc()], k=5, descending=False
    ).select("query_id", "vec_id", "label", "cos_sim")


# Recall floor for the trained-IVF verdict — matches the pytest pin
# (measured 0.53-0.60 on the testdata; random 2-of-8 cells would give
# ~0.25, so 0.4 separates 'works' from 'broken' with margin for
# k-means|| init shifting across partitionings).
_IVF_TRAINED_RECALL_FLOOR = 0.4


@query(
    "ivf_ann_topk_trained",
    oracle=f"""
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(has_k_rows AS BOOLEAN) AS has_k_rows,
           CAST(recall_ok AS BOOLEAN) AS recall_ok
    FROM (VALUES {", ".join(f"({q}, true, true)" for q in _IVF_QUERY_IDS)})
         AS t(query_id, has_k_rows, recall_ok)
    """,
)
def ivf_ann_topk_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUND VERDICT for the trained-IVF search (the r10 sketch-verdict
    pattern, closing the r10 rows-only carve-out): per query,
    ``has_k_rows`` (the probe returned a full top-5) and ``recall_ok``
    (recall@5 vs the exact brute-force top-5 ≥ 0.4), graded against a
    literal-true oracle. The trained centers are seeded and
    deterministic within a Spark version but not SQL-replayable, so
    the verdict — not the search rows — is what can hash-check; the
    raw search surface is ``ivf_trained_search`` and its un-thresholded
    recall stays pinned in tests/test_scale_plans.py (a vacuous
    always-true flag cannot pass both).

    Plan: the trained search (see ivf_trained_search) plus the exact
    baseline composed from the REGISTERED cosine_topk_bruteforce plan,
    joined per (query_id, vec_id) — an eval-harness row by nature,
    like ann_recall_report."""
    from currency_etl_pipeline_spark.queries.registry import _REGISTRY

    trained = ivf_trained_search(spark, sf_dir).select("query_id", "vec_id")
    exact = _REGISTRY["cosine_topk_bruteforce"].spark(spark, sf_dir)
    w5 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    exact5 = (
        exact.withColumn("rk", F.row_number().over(w5))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", F.lit(1).alias("hit"))
    )
    return (
        trained.join(exact5, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"),
        )
        .select(
            "query_id",
            (F.col("n_rows") == 5).alias("has_k_rows"),
            (F.col("n_hits") * 1.0 / 5 >= _IVF_TRAINED_RECALL_FLOOR).alias("recall_ok"),
        )
    )


@query(
    "skew_salted_event_stats",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           max("value") AS max_value
    FROM events GROUP BY event_type
    """,
)
def skew_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the 5-value event_type key —
    the skew remedy for hot grouping keys (operators/skew.py). Results
    are identical to the plain GROUP BY (the oracle), which is the
    point: salting changes the plan, never the answer.

    Plan: phase 1 shuffles on (event_type, salt%16) — a hot key's rows
    land on 16 reducers; phase 2 re-aggregates 16 partials per key.
    count re-aggregates as sum, DECIMAL sum as sum, max as max.
    """
    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        keys=["event_type"],
        partial_aggs={
            "pn": F.count(F.lit(1)),
            "psum": F.sum(dec("value")),
            "pmax": F.max("value"),
        },
        final_aggs={
            "n_events": F.sum("pn"),
            "sum_value": F.sum("psum").cast("double"),
            "max_value": F.max("pmax"),
        },
        salt_col=F.xxhash64("event_id"),
        salt_n=16,
    )


@query(
    "skew_salted_supplier_revenue",
    oracle="""
    SELECT s.s_nationkey, count(*) AS n_items,
           round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def skew_salted_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate join (lineitem × supplier on suppkey, supplier
    replicated 8×) then revenue per supplier nation — the mid-size-dim
    skew remedy when the dim is too big to broadcast and a few hot
    keys would stall one reducer (operators/skew.py). Same answer as
    the plain join (the oracle).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(18,6)").alias("rev"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, s, ["l_suppkey"], big_salt_col=F.xxhash64("l_orderkey"), salt_n=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("rev").cast("double"), 4).alias("revenue"),
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n_transitions,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev_type), 6)
             AS p_next
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event sequences: counts
    and row-normalized probabilities of event_type A → B — the
    user-journey / session-flow analysis shape (first-order behavior
    model, anomaly baseline).

    Plan: one lag window per user (shuffle on user_id, the natural
    key), then a (prev, next) count agg — 25 cells — whose
    row-normalizing window runs over the collapsed aggregate, not raw
    events. Two data shuffles total at any scale; the probability
    divide is one exact-integer division per cell at the edge.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_row = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") * 1.0 / F.sum("n_transitions").over(w_row), 6
        ).alias("p_next"),
    )


@query(
    "event_funnel_conversion",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    ), staged AS (
        SELECT user_id, t_view,
               CASE WHEN t_click > t_view THEN t_click END AS t_click_after,
               CASE WHEN t_click > t_view AND t_purchase > t_click
                    THEN t_purchase END AS t_purchase_after
        FROM firsts WHERE t_view IS NOT NULL
    )
    SELECT count(*) AS n_viewed,
           CAST(sum(CASE WHEN t_click_after IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clicked,
           CAST(sum(CASE WHEN t_purchase_after IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchased,
           round(sum(CASE WHEN t_click_after IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS view_to_click,
           round(sum(CASE WHEN t_purchase_after IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / greatest(sum(CASE WHEN t_click_after IS NOT NULL THEN 1 ELSE 0 END), 1),
                 6) AS click_to_purchase
    FROM staged
    """,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user
    converts a step only if that step's FIRST occurrence strictly
    follows the previous step's — the product-analytics funnel with
    ordering semantics, not mere event existence.

    Plan: the per-user step timestamps are conditional min-aggregates
    in ONE partial+final hash agg over events (no joins, no windows —
    the min-CASE trick collapses the funnel to one pass); the funnel
    comparison and the three counters are a second 1-row aggregate.
    At 100 TB this shuffles one 3-timestamp row per user, nothing
    else.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    staged = firsts.filter(F.col("t_view").isNotNull()).select(
        F.when(F.col("t_click") > F.col("t_view"), F.col("t_click")).alias("t_click_after"),
        F.when(
            (F.col("t_click") > F.col("t_view")) & (F.col("t_purchase") > F.col("t_click")),
            F.col("t_purchase"),
        ).alias("t_purchase_after"),
    )
    clicked = F.sum(F.when(F.col("t_click_after").isNotNull(), 1).otherwise(0))
    purchased = F.sum(F.when(F.col("t_purchase_after").isNotNull(), 1).otherwise(0))
    return staged.agg(
        F.count(F.lit(1)).alias("n_viewed"),
        clicked.alias("n_clicked"),
        purchased.alias("n_purchased"),
        F.round(clicked * 1.0 / F.count(F.lit(1)), 6).alias("view_to_click"),
        F.round(purchased * 1.0 / F.greatest(clicked, F.lit(1)), 6).alias(
            "click_to_purchase"
        ),
    )


@query(
    "weekly_retention_cohorts",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    ), cohorts AS (
        SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY user_id
    ), joined AS (
        SELECT c.cohort_week, CAST(datediff('day', c.cohort_week, a.week) // 7 AS BIGINT)
                 AS week_offset,
               a.user_id
        FROM activity a JOIN cohorts c USING (user_id)
    ), counts AS (
        SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_active
        FROM joined GROUP BY cohort_week, week_offset
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset, n_active,
           round(n_active * 1.0 / first(n_active) OVER (
               PARTITION BY cohort_week ORDER BY week_offset
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6)
             AS retention
    FROM counts
    """,
)
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active week; for each
    later week, the fraction of the cohort still active — THE
    product-analytics table (sign-up cohort decay curves).

    Plan: distinct (user, week) pairs collapse the event stream first
    (the only corpus-sized shuffle); cohorts are a min-agg per user
    reusing that partitioning; the activity⋈cohort join is on user_id;
    the final matrix is |cohorts|×|weeks| cells, so the normalizing
    window (anchored at week_offset 0 via an unbounded-frame first)
    runs over a tiny aggregate. At 100 TB nothing after the first
    distinct touches more than one row per user-week.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = activity.join(cohorts, "user_id").select(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("long").alias(
            "week_offset"
        ),
        "user_id",
    )
    counts = joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    w0 = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return counts.select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
        F.round(F.col("n_active") * 1.0 / F.first("n_active").over(w0), 6).alias(
            "retention"
        ),
    )


def _registered_oracle(name: str) -> str:
    """The already-registered oracle SQL of another catalog query —
    composition device for eval queries that grade one query against
    another (vectors.py registers before this module runs; import
    order is pinned by this module's own vectors import)."""
    from currency_etl_pipeline_spark.queries.registry import _REGISTRY

    return _REGISTRY[name].oracle


@query(
    "ann_recall_report",
    oracle=f"""
    WITH exact5 AS (
      SELECT query_id, vec_id FROM ({_registered_oracle("cosine_topk_bruteforce")})
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id ASC) <= 5
    ),
    res AS (
      SELECT 'ivf' AS method, query_id, vec_id
      FROM ({_registered_oracle("ivf_ann_topk")})
      UNION ALL
      SELECT 'lsh' AS method, query_id, vec_id
      FROM ({_registered_oracle("ann_lsh_topk")})
      UNION ALL
      SELECT 'lsh4' AS method, query_id, vec_id
      FROM ({_registered_oracle("ann_lsh_multitable_topk")})
      UNION ALL
      SELECT 'pq' AS method, query_id, vec_id
      FROM ({_registered_oracle("pq_ann_topk")})
      UNION ALL
      SELECT 'pqn' AS method, query_id, vec_id
      FROM ({_registered_oracle("pq_ann_topk_normalized")})
      UNION ALL
      SELECT 'pqr' AS method, query_id, vec_id
      FROM ({_registered_oracle("pq_rerank_topk")})
    ),
    hits AS (
      SELECT r.method, r.query_id,
             count(*) AS n_returned,
             CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM res r LEFT JOIN exact5 e
        ON e.query_id = r.query_id AND e.vec_id = r.vec_id
      GROUP BY r.method, r.query_id
    ),
    scaffold AS (
      SELECT m.method, CAST(q.query_id AS BIGINT) AS query_id
      FROM (SELECT unnest(['ivf', 'lsh', 'lsh4', 'pq', 'pqn', 'pqr']) AS method) m
      CROSS JOIN (SELECT unnest([0, 1, 2]) AS query_id) q
    )
    SELECT s.method, s.query_id,
           CAST(COALESCE(h.n_returned, 0) AS BIGINT) AS n_returned,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(COALESCE(h.n_hits, 0) / 5.0, 6) AS recall_at_5
    FROM scaffold s LEFT JOIN hits h
      ON h.method = s.method AND h.query_id = s.query_id
    """,
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 evaluation of the approximate-NN variants against the
    exact brute-force top-5, per query: (method, query_id, n_returned,
    n_hits, recall_at_5) — the measure-don't-guess harness an ANN
    serving stack needs before tuning nprobe / bucket width. A method
    may legitimately return fewer than 5 rows (LSH buckets can be
    small), so n_returned rides along and empty (method, query) cells
    still emit a zero row via the literal scaffold.

    Composition: reuses the registered ivf_ann_topk / ann_lsh_topk /
    cosine_topk_bruteforce plans verbatim (the oracle embeds their
    registered SQL the same way), adding only a broadcast-sized join
    and a 6-row aggregate on top. The corpus is scanned once per
    evaluated method plus once for the exact baseline — an eval
    harness's inherent cost; at scale the probe set is a sample, and
    each sub-plan keeps its own documented scale story.
    """
    from currency_etl_pipeline_spark.queries.vectors import (
        ann_lsh_multitable_topk,
        ann_lsh_topk,
        cosine_topk_bruteforce,
        pq_ann_topk,
        pq_ann_topk_normalized,
        pq_rerank_topk,
    )

    exact5 = top_k_per_group(
        cosine_topk_bruteforce(spark, sf_dir),
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("vec_id").asc()],
        k=5,
        descending=False,
    ).select("query_id", "vec_id", F.lit(1).alias("hit"))
    res = (
        ivf_ann_topk(spark, sf_dir)
        .select("query_id", "vec_id")
        .withColumn("method", F.lit("ivf"))
        .unionByName(
            ann_lsh_topk(spark, sf_dir)
            .select("query_id", "vec_id")
            .withColumn("method", F.lit("lsh"))
        )
        .unionByName(
            ann_lsh_multitable_topk(spark, sf_dir)
            .select("query_id", "vec_id")
            .withColumn("method", F.lit("lsh4"))
        )
        .unionByName(
            # r9: PQ/ADC graded too. It ranks by quantized squared-L2,
            # so its recall against the COSINE top-5 also measures the
            # metric mismatch on non-normalized embeddings — exactly
            # the kind of fact this report exists to surface before
            # anyone serves with it (the fix, if needed, is
            # embedding_l2_normalize upstream, which makes L2 and
            # cosine rankings coincide).
            pq_ann_topk(spark, sf_dir)
            .select("query_id", "vec_id")
            .withColumn("method", F.lit("pq"))
        )
        .unionByName(
            # r9 hypothesis test, rejected by this report: the corpus
            # is already unit-norm, so pqn's rows equal pq's — see
            # pq_ann_topk_normalized's docstring.
            pq_ann_topk_normalized(spark, sf_dir)
            .select("query_id", "vec_id")
            .withColumn("method", F.lit("pqn"))
        )
        .unionByName(
            # The repair that measurement actually supports: wider
            # codebook + ADC shortlist + exact re-rank.
            pq_rerank_topk(spark, sf_dir)
            .select("query_id", "vec_id")
            .withColumn("method", F.lit("pqr"))
        )
    )
    agg = (
        res.join(exact5, ["query_id", "vec_id"], "left")
        .groupBy("method", "query_id")
        .agg(
            F.count(F.lit(1)).alias("n_returned"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
    )
    scaffold = spark.createDataFrame(
        [(m, q) for m in ("ivf", "lsh", "lsh4", "pq", "pqn", "pqr") for q in _IVF_QUERY_IDS],
        "method string, query_id bigint",
    )
    return scaffold.join(agg, ["method", "query_id"], "left").select(
        "method",
        "query_id",
        F.coalesce("n_returned", F.lit(0)).cast("long").alias("n_returned"),
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(5.0), 6).alias("recall_at_5"),
    )


@query(
    "twap_daily_value",
    oracle="""
    WITH t AS (
      SELECT event_type, CAST(ts AS DATE) AS day, epoch_us(ts) AS tus,
             "value", ts, event_id
      FROM events
    ),
    wt AS (
      SELECT event_type, day, "value",
             (COALESCE(lead(tus) OVER (PARTITION BY event_type, day
                                       ORDER BY ts, event_id),
                       epoch_us(CAST(day + INTERVAL 1 DAY AS TIMESTAMP)))
              - tus) // 1000 AS w_ms
      FROM t
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(w_ms) AS BIGINT) AS total_ms,
           round(CAST(sum(CAST("value" * w_ms AS DECIMAL(28,6))) AS DOUBLE)
                 / CAST(sum(w_ms) AS DOUBLE), 6) AS twap
    FROM wt GROUP BY event_type, day
    """,
)
def twap_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (event_type, day) — the TWAP the
    reference's currency domain prices with: each observation holds
    (last-observation-carried-forward) until the next one in its key's
    day, the final observation until midnight, and the day's average
    weighs each value by its holding time. A plain AVG over irregular
    ticks over-weights bursts; TWAP is the standard fix.

    Exactness: holding times are integer MILLISECONDS (floor of the
    microsecond gap — sub-ms truncation is the documented quantum, and
    integer division agrees across engines), each value x weight is
    one per-row IEEE product cast to DECIMAL(28,6) half-up, the
    cross-row sums are exact DECIMAL/BIGINT (order-independent), and
    ONE fixed-form double division + 6 dp round sits at the edge —
    the drift report's discipline. Scaled-integer magnitude stays far
    below 2^53, so the DECIMAL->DOUBLE cast is engine-identical.

    Plan/scale: one window pass (lead over (key, day) — shuffles each
    row once on the partition keys) + one hash aggregate over the same
    keys, which AQE plans without a second exchange; no self-joins, no
    corpus-sized state.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    w = Window.partitionBy("event_type", day).orderBy("ts", "event_id")
    tus = F.unix_micros(F.col("ts"))
    eod = F.unix_micros(F.date_add(day, 1).cast("timestamp"))
    wt = ev.select(
        "event_type",
        day.alias("day"),
        F.col("value"),
        (F.coalesce(F.lead(tus).over(w), eod) - tus).alias("w_us"),
    ).withColumn("w_ms", F.expr("w_us DIV 1000"))
    return wt.groupBy("event_type", F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("w_ms").alias("total_ms"),
        F.round(
            F.sum((F.col("value") * F.col("w_ms")).cast("decimal(28,6)")).cast("double")
            / F.sum("w_ms").cast("double"),
            6,
        ).alias("twap"),
    )


@query(
    "ohlc_daily_bars",
    oracle="""
    WITH t AS (
      SELECT event_type, CAST(ts AS DATE) AS day, "value", ts, event_id,
             first_value("value") OVER (
               PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open,
             last_value("value") OVER (
               PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close
      FROM events
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           any_value(open) AS open,
           max("value") AS high,
           min("value") AS low,
           any_value(close) AS close,
           CAST(count(*) AS BIGINT) AS n_ticks
    FROM t GROUP BY event_type, day
    """,
)
def ohlc_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars per (event_type, day): open = first tick's
    value by (ts, event_id), high/low = extremes, close = last tick's —
    the canonical downsampling every rates dashboard charts (the
    reference plots raw history; bars are what it would draw at any
    zoom level). Every output is a RAW input double carried through
    (first/last/min/max never do arithmetic), so cross-engine parity
    needs no rounding at all; the (ts, event_id) tie-break makes
    open/close deterministic under equal timestamps.

    Plan/scale: one full-frame window pass over (key, day) + the
    aligned hash aggregate — same single-shuffle shape as the TWAP
    twin; bars output is |keys| x |days| rows, trivially small.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    w = (
        Window.partitionBy("event_type", day)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    t = ev.select(
        "event_type",
        day.alias("day"),
        "value",
        F.first("value").over(w).alias("open"),
        F.last("value").over(w).alias("close"),
    )
    return t.groupBy("event_type", F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.any_value("open").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.any_value("close").alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


# EWMA taps: alpha = 1/2 over the trailing _EWMA_K observations. The
# weights 2^(K-1-k) are exact integers, so the whole weighted sum is
# per-row BIGINT arithmetic — no float accumulation to reassociate.
_EWMA_K = 8

# Scale-6 quantization of one double (the TWAP/drift discipline at the
# value's natural scale): exact DECIMAL intermediate, half-up in both
# engines.
_Q6_DUCK = "CAST(CAST({x} AS DECIMAL(19,6)) * 1000000 AS BIGINT)"


@query(
    "ewma_value_smoothing",
    oracle=f"""
    WITH q AS (
      SELECT event_id, event_type, ts, "value",
             {_Q6_DUCK.format(x='"value"')} AS xq
      FROM events
    ),
    t AS (
      SELECT event_id, event_type, ts, "value",
             {" + ".join(
                 f"coalesce(lag(xq, {k}) OVER w, 0) * {1 << (_EWMA_K - 1 - k)}"
                 for k in range(_EWMA_K)
             )} AS num,
             least(row_number() OVER w, {_EWMA_K}) AS avail
      FROM q
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_utc, "value",
           round(CAST(num AS DOUBLE)
                 / (CAST({1 << _EWMA_K} - (1 << ({_EWMA_K} - avail)) AS DOUBLE)
                    * 1000000.0), 6) AS ewma
    FROM t
    """,
)
def ewma_value_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per
    event_type — the standard tick-noise smoother every rates chart
    draws (alpha = 1/2, truncated to the trailing {_EWMA_K} = 8
    observations; beyond 8 taps the residual weight is < 0.4% and the
    truncation makes the recurrence a FIXED-ARITY expression instead
    of an unboundable sequential scan).

    Engine-exactness: the classic EWMA recurrence compounds float
    error and a float pow(alpha, k) is not cross-libm identical — so
    the weights are exact INTEGERS 2^(K-1-k) (alpha = 1/2 makes every
    weight a power of two), each value is quantized once to scale-6
    BIGINT (half-up DECIMAL cast, identical in both engines), and the
    weighted sum is per-row integer arithmetic. The warm-up rows
    normalize by the weights actually present (denominator
    2^K − 2^(K−avail), also exact); ONE fixed-form double division +
    6 dp round sits at the edge. |num| ≤ 2^8 × 1e6 × |value| ≪ 2^63.

    Plan/scale: one window pass (8 lags + row_number share the same
    (event_type)/(ts, event_id) window — ONE shuffle, one sort, all
    lags evaluated in the same frame walk), then a map-only
    projection. No joins, no state beyond the 8-row frame.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    xq = (F.col("value").cast("decimal(19,6)") * F.lit(1_000_000)).cast("long")
    q = ev.select("event_id", "event_type", "ts", "value", xq.alias("xq"))
    num = None
    for k in range(_EWMA_K):
        term = F.coalesce(F.lag("xq", k).over(w), F.lit(0)) * F.lit(
            1 << (_EWMA_K - 1 - k)
        )
        num = term if num is None else num + term
    avail = F.least(F.row_number().over(w), F.lit(_EWMA_K))
    t = q.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        num.alias("num"),
        avail.alias("avail"),
    )
    denom = F.expr(f"{1 << _EWMA_K} - shiftleft(1, {_EWMA_K} - avail)")
    return t.select(
        "event_id",
        "event_type",
        ts_str("ts").alias("ts_utc"),
        "value",
        F.round(
            F.col("num").cast("double") / (denom.cast("double") * F.lit(1_000_000.0)),
            6,
        ).alias("ewma"),
    )


@query(
    "rolling_volatility_close",
    oracle=f"""
    WITH q AS (
      SELECT event_type, ts, event_id, CAST(ts AS DATE) AS day,
             epoch_us(ts) AS tus,
             {_Q6_DUCK.format(x='"value"')} AS xq
      FROM events
    ),
    roll AS (
      SELECT event_type, ts, event_id, day,
             count(*) OVER w AS n,
             sum(CAST(xq AS HUGEINT)) OVER w AS s1,
             sum(CAST(xq AS HUGEINT) * xq) OVER w AS s2
      FROM q
      WINDOW w AS (PARTITION BY event_type ORDER BY tus
                   RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    ),
    closing AS (
      SELECT event_type, day, n,
             n * s2 - s1 * s1 AS num,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM roll
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n_ticks,
           round(sqrt(CAST(num AS DOUBLE)) / (CAST(n AS DOUBLE) * 1000000.0),
                 6) AS close_vol
    FROM closing WHERE rn = 1
    """,
)
def rolling_volatility_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closing trailing-24h volatility per (event_type, day): at each
    day's last tick, the population stddev of ``value`` over the
    trailing 24 hours (RANGE frame — time-bounded, not row-bounded, so
    quiet and busy periods are measured over the same horizon). The
    rolling risk metric a rates desk pairs with the OHLC bars.

    Engine-exactness: values quantize once to scale-6 BIGINT; the
    range frame accumulates exact integer partials (n, Σx, Σx² —
    DuckDB sums in HUGEINT, Spark in DECIMAL(38,0), both exact and
    order-free), the variance numerator n·Σx² − (Σx)² stays integer
    (Cauchy-Schwarz keeps it ≥ 0), and the edge is one fixed-form
    sqrt + division + 6 dp round (sqrt IS cross-libm identical,
    unlike pow/log). Magnitudes: |xq| ≤ ~6e8 at the fixture's value
    range → n·Σx² ≤ ~3e27, inside both DECIMAL(38,0) and int128.

    Plan/scale (r9 bench-driven rewrite): the obvious per-row RANGE
    frame measured 18 s at sf0.1 — Spark's sliding-frame aggregates
    RECOMPUTE the whole frame per row (no inverse-add), so a 24 h
    frame costs O(rows × frame) exact-DECIMAL adds even though only
    ONE row per (key, day) is ever emitted. Instead: derive the
    closing-tick table first (row_number over (key, day) — |keys| ×
    |days| rows, calendar-bounded, scale-factor-independent), BROADCAST
    it, and range-join each event to its key's closing ticks within
    24 h — a BroadcastHashJoin on event_type with the time bounds as
    the join residual, then ONE exact-DECIMAL hash aggregate over the
    matched rows. Work drops from rows × frame to rows × days-per-key
    comparisons + matches × 1 aggregation adds (18 s → ~1 s at sf0.1,
    values identical — the oracle still states the per-row-window
    form, which DuckDB executes fine).
    """
    ev = load_table(spark, sf_dir, "events")
    xq = (F.col("value").cast("decimal(19,6)") * F.lit(1_000_000)).cast("long")
    q = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("tus"),
        xq.alias("xq"),
    )
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    closing = (
        q.select("event_type", "day", "tus", F.row_number().over(wd).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            F.col("event_type").alias("c_type"),
            F.col("day").alias("c_day"),
            F.col("tus").alias("c_tus"),
        )
    )
    matched = q.join(
        F.broadcast(closing),
        (F.col("event_type") == F.col("c_type"))
        & (F.col("tus") >= F.col("c_tus") - F.lit(86_400_000_000))
        & (F.col("tus") <= F.col("c_tus")),
    )
    agg = matched.groupBy("c_type", "c_day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xq").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            F.col("xq").cast("decimal(19,0)") * F.col("xq").cast("decimal(19,0)")
        ).alias("s2"),
    )
    num = F.col("n").cast("decimal(38,0)") * F.col("s2") - F.col("s1") * F.col("s1")
    return agg.select(
        F.col("c_type").alias("event_type"),
        F.date_format("c_day", "yyyy-MM-dd").alias("day"),
        F.col("n").alias("n_ticks"),
        F.round(
            F.sqrt(num.cast("double")) / (F.col("n").cast("double") * F.lit(1_000_000.0)),
            6,
        ).alias("close_vol"),
    )


@query(
    "max_drawdown_daily",
    oracle="""
    WITH t AS (
      SELECT event_type, CAST(ts AS DATE) AS day, "value",
             max("value") OVER (
               PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS run_max
      FROM events WHERE "value" > 0
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_ticks,
           round(max((run_max - "value") / run_max), 6) AS max_drawdown,
           max(run_max) AS peak
    FROM t GROUP BY event_type, day
    """,
)
def max_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum intraday drawdown per (event_type, day): the largest
    peak-to-trough relative drop, where the peak is the running maximum
    in tick order — THE risk statistic a rates desk reads next to the
    OHLC bars and the rolling volatility (a series can be low-variance
    yet carry a deep drawdown, and vice versa). Zero/negative values
    are excluded up front (a 0 peak makes the ratio undefined; the
    fixture has value > 0 except a handful of exact zeros).

    Engine-exactness without any quantization: the running max is a
    RAW input double (no arithmetic — max just selects), each
    drawdown is ONE per-row IEEE division (deterministic bit-for-bit),
    and the final MAX over those doubles is order-free. Only the 6 dp
    round at the edge touches formatting. This is the no-arithmetic
    discipline of ohlc_daily_bars extended through a division.

    Plan/scale: one window pass over (event_type, day) in tick order +
    the aligned hash aggregate — the exact single-shuffle shape of the
    TWAP/OHLC twins (the groupBy keys equal the window partition keys,
    so AQE plans no second exchange). Output |keys| × |days| rows.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    day = F.to_date("ts")
    w = (
        Window.partitionBy("event_type", day)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = ev.select(
        "event_type",
        day.alias("day"),
        "value",
        F.max("value").over(w).alias("run_max"),
    )
    return t.groupBy("event_type", F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.round(
            F.max((F.col("run_max") - F.col("value")) / F.col("run_max")), 6
        ).alias("max_drawdown"),
        F.max("run_max").alias("peak"),
    )


@query(
    "cusum_drift_alerts",
    oracle=f"""
    WITH q AS (
      SELECT event_type, ts, event_id, CAST(ts AS DATE) AS day,
             {_Q6_DUCK.format(x='"value"')} AS xq
      FROM events
    ),
    m AS (
      SELECT *,
             CAST((sum(CAST(xq AS HUGEINT)) OVER tp
                   + count(*) OVER tp // 2) // count(*) OVER tp AS BIGINT) AS meanq
      FROM q
      WINDOW tp AS (PARTITION BY event_type)
    ),
    c AS (
      SELECT event_type, day, ts, event_id,
             sum(CAST(xq - meanq AS HUGEINT)) OVER w AS cum
      FROM m
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    s AS (
      SELECT event_type, day,
             CAST(cum - min(cum) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS stat
      FROM c
    ),
    d AS (
      SELECT event_type, day, max(stat) AS cusum_max_e6
      FROM s GROUP BY event_type, day
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(cusum_max_e6 AS BIGINT) AS cusum_max_e6,
           cusum_max_e6 > CAST((sum(CAST(cusum_max_e6 AS HUGEINT)) OVER tp
                                + count(*) OVER tp // 2)
                               // count(*) OVER tp AS BIGINT) AS alert
    FROM d
    WINDOW tp AS (PARTITION BY event_type)
    """,
)
def cusum_drift_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per (event_type, day): the day's
    maximum one-sided cumulative-sum statistic of deviations from the
    series mean, with an alert when it exceeds the per-type average of
    day-maxima — the classic persistent-drift detector a rates desk
    (and a data-quality monitor) runs beside the z-score outlier
    query: z-scores catch single spikes, CUSUM catches many small
    same-direction deviations that never individually alarm.

    The CUSUM recurrence S_i = max(0, S_{{i-1}} + x_i − μ) looks
    sequential, but has the prefix-sum closed form
    **S_i = C_i − min_{{j≤i}} C_j** (C = running sum of deviations) —
    two stacked running windows, fully distributable, no iterative
    loop. Everything on the comparison surface is an exact integer:
    scale-6 quantized values, round-half-up integer mean (the
    cell_mean_vectors discipline), HUGEINT/DECIMAL(38,0) running
    sums, and an integer-vs-integer alert compare — no doubles
    anywhere at all.

    Plan/scale: one shuffle on event_type carries all four window
    passes (full-frame mean, running sum, running min, and — after
    the per-day hash-agg, which AQE plans on the same clustering —
    the full-frame day-max average). State per partition is O(1);
    output is |types| × |days| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    xq = (F.col("value").cast("decimal(19,6)") * F.lit(1_000_000)).cast("long")
    q = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.to_date("ts").alias("day"),
        xq.alias("xq"),
    )
    wfull = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = (
        q.withColumn("ssum", F.sum(F.col("xq").cast("decimal(38,0)")).over(wfull))
        .withColumn("n", F.count(F.lit(1)).over(wfull))
        .withColumn("meanq", F.expr("CAST((ssum + CAST(n DIV 2 AS DECIMAL(38,0))) DIV n AS BIGINT)"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = m.select(
        "event_type",
        "day",
        "ts",
        "event_id",
        F.sum((F.col("xq") - F.col("meanq")).cast("decimal(38,0)")).over(wcum).alias("cum"),
    )
    s = c.select(
        "event_type",
        "day",
        (F.col("cum") - F.min("cum").over(wcum)).cast("long").alias("stat"),
    )
    d = s.groupBy("event_type", "day").agg(F.max("stat").alias("cusum_max_e6"))
    wt = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        d.withColumn("dsum", F.sum(F.col("cusum_max_e6").cast("decimal(38,0)")).over(wt))
        .withColumn("dn", F.count(F.lit(1)).over(wt))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cusum_max_e6",
            (
                F.col("cusum_max_e6")
                > F.expr("CAST((dsum + CAST(dn DIV 2 AS DECIMAL(38,0))) DIV dn AS BIGINT)")
            ).alias("alert"),
        )
    )


@query(
    "equi_depth_histogram",
    oracle="""
    WITH b AS (
      SELECT event_type, "value",
             ntile(10) OVER (PARTITION BY event_type
                             ORDER BY "value", event_id) AS bucket
      FROM events
    )
    SELECT event_type, bucket,
           CAST(count(*) AS BIGINT) AS n,
           min("value") AS lo,
           max("value") AS hi
    FROM b GROUP BY event_type, bucket
    """,
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 buckets of equal row count) of value
    per event_type — the skew-robust twin of ``value_histogram``'s
    fixed-width buckets: equal-width buckets collapse under heavy
    tails (one bucket holds everything), equal-depth bounds adapt to
    the distribution, which is what query optimizers and feature
    binners actually store. Completes the distribution family:
    fixed-width histogram, exact + approx percentiles, sketches, and
    now depth buckets.

    Exactness: bucket assignment is ntile over a TOTAL order
    ((value, event_id) — the tie-break makes equal values land
    deterministically), counts are integers, and lo/hi are RAW input
    doubles (min/max select, never compute). Nothing to quantize.

    Plan/scale: one shuffle on event_type, one sort, ntile + the
    aligned hash aggregate. At 100 TB exact ntile needs the per-type
    sort; the bounded-memory twin is approx_percentile's t-digest
    bounds (lineitem_percentiles_approx) — same trade the percentile
    pair documents.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    b = ev.select("event_type", "value", F.ntile(10).over(w).alias("bucket"))
    return b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@query(
    "value_trend_slope",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             epoch_us(ts) // 1000000 - 1704067200 AS xs,
             {_Q6_DUCK.format(x='"value"')} AS yq
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(xs AS HUGEINT)) AS sx,
             sum(CAST(yq AS HUGEINT)) AS sy,
             sum(CAST(xs AS HUGEINT) * xs) AS sxx,
             sum(CAST(xs AS HUGEINT) * yq) AS sxy
      FROM q GROUP BY event_type
    )
    SELECT event_type, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 86400.0 / 1000000.0,
                 9) AS slope_per_day
    FROM m
    """,
)
def value_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares trend per event_type: the slope of value
    against time, reported per DAY — "is this series drifting up or
    down, and how fast", the regression companion to the CUSUM detector
    (CUSUM says WHETHER a persistent shift happened; the slope says the
    RATE). slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over exact
    integer partials: x = whole seconds since the 2024-01-01 anchor
    (bounded ~3e6 for the fixture's window — the anchor keeps Σx² far
    inside int128/DECIMAL(38,0) at any row count), y = scale-6
    quantized value. ONE fixed-form double division + unit conversion
    at the edge, so both engines emit identical bits — the co-moment
    discipline (lineitem_corr_moments) applied to regression.

    Plan/scale: a single hash aggregate over one scan — all five
    partials are mergeable map-side combines; output is |types| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    yq = (F.col("value").cast("decimal(19,6)") * F.lit(1_000_000)).cast("long")
    q = ev.select(
        "event_type",
        (F.unix_micros("ts") / F.lit(1_000_000)).cast("long").alias("_xs_raw"),
        yq.alias("yq"),
    ).select(
        "event_type",
        (F.col("_xs_raw") - F.lit(1_704_067_200)).alias("xs"),
        "yq",
    )
    d38 = "decimal(38,0)"
    m = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xs").cast(d38)).alias("sx"),
        F.sum(F.col("yq").cast(d38)).alias("sy"),
        F.sum(F.col("xs").cast("decimal(19,0)") * F.col("xs").cast("decimal(19,0)")).alias("sxx"),
        F.sum(F.col("xs").cast("decimal(19,0)") * F.col("yq").cast("decimal(19,0)")).alias("sxy"),
    )
    num = F.col("n").cast(d38) * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n").cast(d38) * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        "event_type",
        "n",
        F.round(
            num.cast("double") / den.cast("double") * F.lit(86_400.0) / F.lit(1_000_000.0),
            9,
        ).alias("slope_per_day"),
    )


@query(
    "value_autocorr_lag1",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             {_Q6_DUCK.format(x='"value"')} AS xq,
             lead({_Q6_DUCK.format(x='"value"')}) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS yq
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_pairs,
             sum(CAST(xq AS HUGEINT)) AS sx,
             sum(CAST(yq AS HUGEINT)) AS sy,
             sum(CAST(xq AS HUGEINT) * xq) AS sxx,
             sum(CAST(yq AS HUGEINT) * yq) AS syy,
             sum(CAST(xq AS HUGEINT) * yq) AS sxy
      FROM q WHERE yq IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n_pairs,
           CASE WHEN n_pairs * sxx - sx * sx <= 0
                  OR n_pairs * syy - sy * sy <= 0 THEN NULL
                ELSE round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))),
                           9)
           END AS autocorr_lag1
    FROM m
    """,
)
def value_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of value per event_type — "does this
    series remember its last tick?", the memory/persistence companion
    to value_trend_slope (rate of drift) and cusum_drift_alerts
    (persistent shifts): near 0 says the series is white around its
    mean (z-score alerting is sound); near 1 says shocks persist
    (alert on CHANGES, not levels).

    Pearson r over (x_i, x_{i+1}) pairs: pairs come from one window
    lead over the (ts, event_id) total order per type, then the exact
    co-moment discipline — x and the led y are scale-6 quantized
    BIGINTs, all six partials (n, Σx, Σy, Σx², Σy², Σxy) are exact
    DECIMAL(38,0)/HUGEINT sums (bounded: yq ≤ 5.7e8, so n·Σy² ≤ ~1e28
    « 1e38 at any per-type row count), and the output is ONE
    fixed-form double expression — num / (sqrt(da)·sqrt(db)) — both
    engines evaluate on identical integers, rounded at 9 dp.
    Degenerate series (zero variance on either side) emit NULL
    explicitly in BOTH engines (Spark's /0 → NULL vs DuckDB's → inf
    would otherwise diverge — the FIXTURES.md guard convention).

    Plan/scale: one shuffle on event_type (the window), pairs never
    materialize beyond the frame walk, then a map-side-combinable hash
    aggregate to |types| rows. The lag-k generalization is the same
    plan with lead(k); a distributed no-window variant would self-join
    on (event_type, rank) = (event_type, rank+1) — not needed while
    the per-type sort fits the executor, the same trade
    equi_depth_histogram documents.
    """
    ev = load_table(spark, sf_dir, "events")
    xq = (F.col("value").cast("decimal(19,6)") * F.lit(1_000_000)).cast("long")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    q = ev.select("event_type", "ts", "event_id", xq.alias("xq")).select(
        "event_type", "xq", F.lead("xq").over(w).alias("yq")
    )
    d19, d38 = "decimal(19,0)", "decimal(38,0)"
    m = (
        q.filter(F.col("yq").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("xq").cast(d38)).alias("sx"),
            F.sum(F.col("yq").cast(d38)).alias("sy"),
            F.sum(F.col("xq").cast(d19) * F.col("xq").cast(d19)).alias("sxx"),
            F.sum(F.col("yq").cast(d19) * F.col("yq").cast(d19)).alias("syy"),
            F.sum(F.col("xq").cast(d19) * F.col("yq").cast(d19)).alias("sxy"),
        )
    )
    n38 = F.col("n_pairs").cast(d38)
    num = n38 * F.col("sxy") - F.col("sx") * F.col("sy")
    da = n38 * F.col("sxx") - F.col("sx") * F.col("sx")
    db = n38 * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (da <= 0) | (db <= 0), F.lit(None).cast("double")
    ).otherwise(
        F.round(num.cast("double") / (F.sqrt(da.cast("double")) * F.sqrt(db.cast("double"))), 9)
    )
    return m.select("event_type", "n_pairs", r.alias("autocorr_lag1"))


@query(
    "peak_concurrent_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s,
               event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id,
               min(ts) AS s_start,
               max(ts) + INTERVAL 30 MINUTE AS s_end
        FROM (SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM flagged) g
        GROUP BY user_id, sid
    ), segs AS (
        SELECT CAST(d.d AS DATE) AS day,
               greatest(s_start, d.d) AS seg_start,
               least(s_end, d.d + INTERVAL 1 DAY) AS seg_end
        FROM sess
        CROSS JOIN unnest(generate_series(date_trunc('day', s_start),
                                          date_trunc('day', s_end - INTERVAL 1 MICROSECOND),
                                          INTERVAL 1 DAY)) AS d(d)
    ), bounds AS (
        SELECT day, seg_start AS bts, 1 AS delta FROM segs
        UNION ALL
        SELECT day, seg_end AS bts, -1 AS delta FROM segs
    ), running AS (
        SELECT day, delta,
               sum(delta) OVER (PARTITION BY day ORDER BY bts, delta) AS live
        FROM bounds
    )
    SELECT day,
           CAST(max(live) AS BIGINT) AS peak_concurrent,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM running GROUP BY day
    """,
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak session concurrency per day — the sweep-line/occupancy
    operator (max rooms booked, peak load, concurrent viewers):
    sessions become ±1 boundary events, a running sum counts live
    sessions, the per-day max is the peak. Session intervals are the
    catalog's session_window semantics verbatim ([min ts, max ts +
    30 min), the event_sessionization contract), so "concurrent"
    means 'both users were mid-session', not 'events at the same
    instant'.

    Distribution device: a GLOBAL sweep order is the textbook
    scale-killer here (one sort partition owning the whole timeline),
    so midnight-crossing sessions are SPLIT at day boundaries first —
    sequence() explodes each session into its touched days with
    clamped [seg_start, seg_end) pieces — and each day's sweep runs
    independently inside its own partition. A session live at
    midnight carries a +1 at the next day's 00:00, so cross-day state
    is reconstructed locally, never communicated; finer shards (hours)
    drop in by changing the split unit.

    Determinism without a row-level tie-break: ordering by (bts,
    delta) puts ends before starts at a shared instant (touching
    sessions never double-count) and leaves the peer-group order
    unspecified — but the default RANGE frame sums the WHOLE peer
    group at once in both engines, and within a same-delta group the
    running value is monotone, so the per-day MAX is exact and
    engine-identical even though per-row prefix orders aren't. A -1
    can't lead a day (a clamped segment ending at day start is never
    emitted), so the group-end maxima include the true peak. Output
    is DATE + two BIGINTs — no float surface at all.

    Plan/scale: one shuffle on user_id (sessionize), one on day
    (sweep); boundaries are 2 rows per session-day — the shuffled
    volume is session-scale, not event-scale.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("sw.start").alias("s_start"), F.col("sw.end").alias("s_end"))
    )
    segs = sess.select(
        F.explode(
            F.sequence(
                F.to_date("s_start"),
                F.to_date(F.expr("s_end - INTERVAL 1 MICROSECOND")),
            )
        ).alias("day"),
        "s_start",
        "s_end",
    ).select(
        "day",
        F.greatest(F.col("s_start"), F.col("day").cast("timestamp")).alias("seg_start"),
        F.least(
            F.col("s_end"), F.expr("CAST(day AS TIMESTAMP) + INTERVAL 1 DAY")
        ).alias("seg_end"),
    )
    # ONE pass emits both boundaries (a union of two selects over segs
    # would re-run the whole sessionize subtree — Catalyst duplicates,
    # not shares, a twice-referenced DataFrame).
    bounds = segs.select(
        "day",
        F.explode(
            F.array(
                F.struct(F.col("seg_start").alias("bts"), F.lit(1).alias("delta")),
                F.struct(F.col("seg_end").alias("bts"), F.lit(-1).alias("delta")),
            )
        ).alias("b"),
    ).select("day", "b.bts", "b.delta")
    w = Window.partitionBy("day").orderBy("bts", "delta")
    running = bounds.select("day", "delta", F.sum("delta").over(w).alias("live"))
    return running.groupBy("day").agg(
        F.max("live").cast("long").alias("peak_concurrent"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).cast("long").alias("n_sessions"),
    )


# Transition-lift knobs, mirroring the bigram_lift collocation family.
_TRANS_MIN_COUNT, _TRANS_TOPK = 5, 20


@query(
    "event_transition_lift",
    oracle=f"""
    WITH seq AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ), tr AS (SELECT src, dst FROM seq WHERE dst IS NOT NULL),
    tcnt AS (SELECT src, dst, count(*) AS c_xy FROM tr GROUP BY 1, 2),
    scnt AS (SELECT src, count(*) AS c_x FROM tr GROUP BY 1),
    dcnt AS (SELECT dst, count(*) AS c_y FROM tr GROUP BY 1),
    mm AS (SELECT count(*) AS m FROM tr),
    lifted AS (
        SELECT t.src, t.dst, CAST(t.c_xy AS BIGINT) AS c_xy,
               round((CAST(t.c_xy AS DOUBLE) * mm.m)
                     / (CAST(s.c_x AS DOUBLE) * d.c_y), 6) AS lift
        FROM tcnt t
        JOIN scnt s ON s.src = t.src
        JOIN dcnt d ON d.dst = t.dst
        CROSS JOIN mm
        WHERE t.c_xy >= {_TRANS_MIN_COUNT}
    )
    SELECT src, dst, c_xy, lift,
           row_number() OVER (ORDER BY lift DESC, src ASC, dst ASC) AS pos
    FROM lifted
    QUALIFY row_number() OVER (ORDER BY lift DESC, src ASC, dst ASC)
            <= {_TRANS_TOPK}
    """,
)
def event_transition_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition mining over user event streams:
    which event_type → event_type transitions happen MORE than their
    marginals predict (lift = P(x→y) / (P(·→y)·P(x→·)), the
    bigram_lift_topk association measure applied to behavior instead
    of text). Funnels assert a HYPOTHESIZED sequence;
    this DISCOVERS the sequences worth asserting — the top lifts are
    the edges a funnel/recommendation model should start from, and a
    lift < 1 on a designed flow (checkout → confirm) is a product bug
    the report surfaces for free.

    Exactness: transition pairs come from one lead() over each user's
    (ts, event_id) total order; every input to lift is an exact
    integer count over the SAME transition relation (pair count, both
    marginals, total m), so the score is one fixed-form double over
    exactly-representable integers — no libm, engine-identical
    ordering, (src, dst) tie-break; pairs under _TRANS_MIN_COUNT (= 5)
    transitions are excluded (1/c noise, the collocation precedent).

    Plan/scale: one shuffle on user_id (the window — same exchange
    every per-user sequence query in the catalog rides), then the
    transition relation collapses to ≤ |types|² rows before anything
    joins: three tiny hash aggregates, broadcast joins, scalar total
    on a literal cross join, TakeOrderedAndProject top-20. The
    event-scale data is touched exactly once.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    tcnt = tr.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
    scnt = tr.groupBy("src").agg(F.count(F.lit(1)).alias("c_x"))
    dcnt = tr.groupBy("dst").agg(F.count(F.lit(1)).alias("c_y"))
    mm = tr.agg(F.count(F.lit(1)).alias("m"))
    lifted = (
        tcnt.filter(F.col("c_xy") >= _TRANS_MIN_COUNT)
        .join(F.broadcast(scnt), "src")
        .join(F.broadcast(dcnt), "dst")
        .crossJoin(F.broadcast(mm))
        .select(
            "src",
            "dst",
            "c_xy",
            F.round(
                (F.col("c_xy").cast("double") * F.col("m"))
                / (F.col("c_x").cast("double") * F.col("c_y")),
                6,
            ).alias("lift"),
        )
    )
    wk = Window.orderBy(F.col("lift").desc(), F.col("src").asc(), F.col("dst").asc())
    return (
        lifted.withColumn("pos", F.row_number().over(wk).cast("long"))
        .filter(F.col("pos") <= _TRANS_TOPK)
    )


_COSESS_TOPK = 50


@query(
    "concurrent_session_pairs",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s,
               event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id,
               min(ts) AS s_start,
               max(ts) + INTERVAL 30 MINUTE AS s_end,
               epoch_us(min(ts)) AS s0
        FROM (SELECT user_id, ts, event_id,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM flagged) g
        GROUP BY user_id, sid
    ), segs AS (
        -- DAY-split oracle scaffold: n_joint counts DISTINCT joint
        -- SESSION pairs (s0 = session identity), so the result is
        -- invariant to the shard unit — the Spark side shards by HOUR
        -- (bounded per-bucket quadratic) and still hashes identically.
        SELECT user_id, s0, CAST(d.d AS DATE) AS day,
               greatest(s_start, d.d) AS seg_start,
               least(s_end, d.d + INTERVAL 1 DAY) AS seg_end
        FROM sess
        CROSS JOIN unnest(generate_series(date_trunc('day', s_start),
                                          date_trunc('day', s_end - INTERVAL 1 MICROSECOND),
                                          INTERVAL 1 DAY)) AS d(d)
    ), ov AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               CAST(count(DISTINCT (a.s0, b.s0)) AS BIGINT) AS n_joint,
               CAST(sum(epoch_us(least(a.seg_end, b.seg_end))
                        - epoch_us(greatest(a.seg_start, b.seg_start))) AS BIGINT)
                   AS overlap_us
        FROM segs a JOIN segs b
          ON a.day = b.day AND a.user_id < b.user_id
         AND a.seg_start < b.seg_end AND b.seg_start < a.seg_end
        GROUP BY 1, 2
    )
    SELECT user_a, user_b, n_joint, overlap_us,
           row_number() OVER (ORDER BY overlap_us DESC, user_a ASC, user_b ASC)
               AS pos
    FROM ov
    QUALIFY row_number() OVER (ORDER BY overlap_us DESC, user_a ASC, user_b ASC)
            <= {_COSESS_TOPK}
    """,
)
def concurrent_session_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap SELF-join: the top-50 user pairs by total
    co-session time (both mid-session simultaneously, summed in exact
    microseconds) — the co-presence operator behind fraud rings
    (accounts always online together), shared-device detection, and
    social-graph inference. peak_concurrent_sessions counts HOW MANY
    are live; this says WHO is live together, completing the interval
    family (as-of = nearest-before, range = window-contains,
    sweep-line = occupancy, this = pairwise overlap).

    Spark has no native interval join; the composition is the
    catalog's time-split device as a JOIN KEY: sessions (the
    session_window 30-min semantics verbatim) are clamped into
    per-HOUR segments, the self-join runs as an hour-bucket EQUI-join
    with the overlap predicate residual — Catalyst hash-partitions by
    hour, so no timeline-wide comparison ever happens, and per-hour
    overlap durations of boundary-split segments SUM back to the true
    total exactly (disjoint clamps), so splitting never double-counts
    microseconds. The r9 form sharded by DAY and was the catalog's
    slowest non-streaming query (6.3 s at sf0.1, VERDICT r9 "What's
    wrong" #4 — per-day-bucket quadratic on co-present users); the
    hour shard bounds each bucket's candidate set at ~1/24th of the
    day population, and the split unit is now a pure plan knob because
    the OUTPUT is granularity-invariant: ``n_joint`` counts DISTINCT
    joint SESSION pairs (session identity = exact session-start
    micros, carried through the clamp), not per-bucket segment pairs
    — the day-split oracle scaffold above hashes identically, which
    is itself the proof the shard unit doesn't leak into the answer.

    Exactness: all arithmetic is BIGINT epoch-microseconds (both
    engines' native timestamp resolution — no rounding surface at
    all); touching sessions (end == start) are excluded by the strict
    inequality in both engines; ties rank by (user_a, user_b).
    """
    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("s_start"),
            F.col("sw.end").alias("s_end"),
            F.unix_micros(F.col("sw.start")).alias("s0"),
        )
    )
    segs = sess.select(
        "user_id",
        "s0",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("s_start")),
                F.date_trunc("hour", F.expr("s_end - INTERVAL 1 MICROSECOND")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hr"),
        "s_start",
        "s_end",
    ).select(
        "user_id",
        "s0",
        "hr",
        F.greatest(F.col("s_start"), F.col("hr")).alias("seg_start"),
        F.least(F.col("s_end"), F.expr("hr + INTERVAL 1 HOUR")).alias("seg_end"),
    )
    a = segs.select(
        F.col("user_id").alias("user_a"),
        F.col("s0").alias("a0"),
        "hr",
        F.col("seg_start").alias("sa"),
        F.col("seg_end").alias("ea"),
    )
    b = segs.select(
        F.col("user_id").alias("user_b"),
        F.col("s0").alias("b0"),
        "hr",
        F.col("seg_start").alias("sb"),
        F.col("seg_end").alias("eb"),
    )
    # A joint session pair spans consecutive hour buckets; its TRUE
    # joint start greatest(a0, b0) lies in exactly one of them, so
    # counting the pair only in that bucket replaces a distinct
    # aggregate (extra shuffle pass over (a0, b0) structs) with a
    # map-side-combinable conditional sum — one aggregation pass.
    joint_start = F.greatest(F.col("a0"), F.col("b0"))
    first_hr = (joint_start >= F.unix_micros(F.col("hr"))).cast("long")
    ov = (
        a.join(b, "hr")
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("sa") < F.col("eb"))
            & (F.col("sb") < F.col("ea"))
        )
        .groupBy("user_a", "user_b")
        .agg(
            F.sum(first_hr).cast("long").alias("n_joint"),
            F.sum(
                F.unix_micros(F.least(F.col("ea"), F.col("eb")))
                - F.unix_micros(F.greatest(F.col("sa"), F.col("sb")))
            ).cast("long").alias("overlap_us"),
        )
    )
    wk = Window.orderBy(
        F.col("overlap_us").desc(), F.col("user_a").asc(), F.col("user_b").asc()
    )
    return (
        ov.withColumn("pos", F.row_number().over(wk).cast("long"))
        .filter(F.col("pos") <= _COSESS_TOPK)
    )


# RRF fusion geometry: the standard k=60 dampener, top-20 per ranker,
# top-5 BM25 seeds for the pseudo-relevance centroid, top-10 fused.
_RRF_K, _RRF_LIST, _RRF_SEEDS, _RRF_OUT = 60, 20, 5, 10
_Q9A = "CAST(CAST({x} AS DECIMAL(19,9)) * 1000000000 AS BIGINT)"


@query(
    "hybrid_rrf_retrieval",
    oracle=f"""
    WITH kw AS ({_registered_oracle("keyword_search_topk")}),
    seeds AS (SELECT doc_id FROM kw WHERE rank <= {_RRF_SEEDS}),
    cent AS (
        SELECT d.i AS i,
               CAST(sum({_Q9A.format(x="e.embedding[d.i]")}) AS BIGINT) AS cq
        FROM embeddings e JOIN seeds s ON e.vec_id = s.doc_id
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d
        GROUP BY d.i
    ),
    nc AS (SELECT sum(CAST(cq AS HUGEINT) * cq) AS nc FROM cent),
    sem AS (
        SELECT e.vec_id,
               sum(CAST({_Q9A.format(x="e.embedding[c.i]")} AS HUGEINT) * c.cq) AS dot,
               sum(CAST({_Q9A.format(x="e.embedding[c.i]")} AS HUGEINT)
                   * {_Q9A.format(x="e.embedding[c.i]")}) AS na
        FROM embeddings e JOIN cent c ON TRUE
        GROUP BY e.vec_id
    ),
    sem_ranked AS (
        SELECT vec_id,
               row_number() OVER (
                   ORDER BY CAST(dot AS DOUBLE)
                            / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nc.nc AS DOUBLE)))
                            DESC, vec_id ASC) AS rank_sem
        FROM sem, nc WHERE na > 0 AND nc.nc > 0
        QUALIFY row_number() OVER (
                   ORDER BY CAST(dot AS DOUBLE)
                            / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nc.nc AS DOUBLE)))
                            DESC, vec_id ASC) <= {_RRF_LIST}
    ),
    fused AS (
        SELECT COALESCE(k.doc_id, s.vec_id) AS doc_id,
               k.rank AS rank_kw, s.rank_sem,
               COALESCE(1000000000 // (CAST({_RRF_K} AS BIGINT) + k.rank), 0)
               + COALESCE(1000000000 // (CAST({_RRF_K} AS BIGINT) + s.rank_sem), 0)
                   AS rrf_e9
        FROM kw k FULL OUTER JOIN sem_ranked s ON s.vec_id = k.doc_id
    )
    SELECT doc_id, rank_kw, rank_sem, CAST(rrf_e9 AS BIGINT) AS rrf_e9,
           row_number() OVER (ORDER BY rrf_e9 DESC, doc_id ASC) AS pos
    FROM fused
    QUALIFY row_number() OVER (ORDER BY rrf_e9 DESC, doc_id ASC) <= {_RRF_OUT}
    """,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: the REGISTERED BM25
    lexical ranking (keyword_search_topk) seeds a pseudo-relevance
    centroid (mean embedding of its top-5, doc_id ≡ vec_id — the
    dedup_consensus corpus convention), a semantic ranking scores every
    vector against that centroid, and the two top-20 lists fuse with
    RRF — the industry-standard lexical+vector hybrid (rank-based, so
    BM25 scores and cosines never need calibrating against each other).

    Integer-exact fusion surface: RRF contributions are
    1e9 DIV (60 + rank) BIGINTs — floor-div of exact integers, so the
    ENTIRE output (ranks, fused score, position) is integer-typed; a
    doc missing from one list contributes 0 there (NULL rank rides to
    the output, telling the reader WHICH signal found it). The
    semantic ordering inside is the one fixed-form double cosine over
    exact scale-9 integer sums (centroid counts cancel per the
    label_centroid_similarity identity), identical in both engines.
    The oracle COMPOSES the registered BM25 SQL verbatim, so the
    fusion is graded against exactly the ranking the catalog ships.

    Plan/scale: the BM25 top-20 is localCheckpointed once (≤ 20 rows —
    referencing its plan twice would re-run the whole posting-list
    scan, the duplicated-subtree class); the centroid is a 64-row
    broadcast; the semantic pass is ONE corpus scan (explode → join
    broadcast centroid → per-vec hash agg computing dot and norm
    together); fusion and the final top-10 run on ≤ 40 rows.
    """
    from currency_etl_pipeline_spark.queries.registry import _REGISTRY

    kw = (
        _REGISTRY["keyword_search_topk"]
        .spark(spark, sf_dir)
        .select("doc_id", "rank")
        .localCheckpoint(eager=True)
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q9 = lambda c: (c.cast("decimal(19,9)") * F.lit(1_000_000_000)).cast("long")  # noqa: E731
    ex = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "x")
    ).select("vec_id", (F.col("i0") + 1).alias("emb_dim"), q9(F.col("x")).alias("xq"))
    # .limit() after the rank filter is a no-op on values but plants a
    # GlobalLimit the broadcast lint reads as a boundedness declaration
    # (a checkpointed top-k's LogicalRDD leaf looks corpus-shaped).
    seeds = (
        kw.filter(F.col("rank") <= _RRF_SEEDS)
        .limit(_RRF_SEEDS)
        .select(F.col("doc_id").alias("vec_id"))
    )
    cent = (
        ex.join(F.broadcast(seeds), "vec_id")
        .groupBy("emb_dim")
        .agg(F.sum("xq").cast("long").alias("cq"))
    )
    d38 = "decimal(38,0)"
    nc = cent.agg(F.sum(F.col("cq").cast(d38) * F.col("cq").cast(d38)).alias("nc"))
    sem = (
        ex.join(F.broadcast(cent), "emb_dim")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("xq").cast(d38) * F.col("cq").cast(d38)).alias("dot"),
            F.sum(F.col("xq").cast(d38) * F.col("xq").cast(d38)).alias("na"),
        )
    )
    cosd = F.col("dot").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nc").cast("double"))
    )
    ws = Window.orderBy(cosd.desc(), F.col("vec_id").asc())
    sem_ranked = (
        sem.crossJoin(F.broadcast(nc))
        .filter((F.col("na") > 0) & (F.col("nc") > 0))
        .withColumn("rank_sem", F.row_number().over(ws).cast("long"))
        .filter(F.col("rank_sem") <= _RRF_LIST)
        .select("vec_id", "rank_sem")
    )
    fused = (
        kw.select(F.col("doc_id").alias("kw_id"), F.col("rank").alias("rank_kw"))
        .join(sem_ranked, F.col("kw_id") == F.col("vec_id"), "full_outer")
        .select(
            F.coalesce(F.col("kw_id"), F.col("vec_id")).alias("doc_id"),
            "rank_kw",
            "rank_sem",
            (
                F.coalesce(
                    F.expr(f"1000000000 DIV ({_RRF_K} + rank_kw)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000000 DIV ({_RRF_K} + rank_sem)"), F.lit(0)
                )
            ).cast("long").alias("rrf_e9"),
        )
    )
    wk = Window.orderBy(F.col("rrf_e9").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("pos", F.row_number().over(wk).cast("long"))
        .filter(F.col("pos") <= _RRF_OUT)
    )
