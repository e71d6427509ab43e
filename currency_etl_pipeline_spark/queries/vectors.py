"""Similarity search over the `embeddings` table (array<float> column)
— the ANN extensions (SURVEY.md §7 Phase 6).

Two paths:
- brute-force cosine top-k: the correctness baseline; crossJoin against
  a broadcast handful of query vectors (the probe side is small by
  construction — this is NOT an O(n²) self-join);
- LSH-bucketed ANN: random-hyperplane signatures (hyperplanes drawn
  deterministically from the data itself so the oracle can replay
  them), candidates = same-bucket pairs → cosine only within buckets.
  At 100 TB the bucket join replaces the full crossJoin; recall is
  tunable by bands/bits.

All vector math is JVM higher-order functions (zip_with/aggregate) on
array<double> — Arrow/pandas never enters the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.tables import load_table

QUERY_IDS = (0, 1, 2)
PLANE_IDS = tuple(range(10, 18))  # 8 deterministic "random" hyperplanes


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — deterministic, matches the
    oracle's list_inner_product evaluation order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"), "label")


_COS_DUCK = (
    "list_inner_product({a}, {b}) / "
    "(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b})))"
)


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv, label FROM embeddings),
    q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id IN (0, 1, 2)),
    scored AS (
        SELECT q.query_id, v.vec_id, v.label,
               round({_COS_DUCK.format(a="v.dv", b="q.qv")}, 6) AS cos_sim
        FROM v CROSS JOIN q
        WHERE v.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, label, cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) <= 10
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 per query vector (brute force baseline).
    Broadcast the 3 probe vectors; one pass over the corpus; per-query
    top-k via row_number on (rounded score, vec_id) — rounding before
    ranking makes the ordering engine-independent."""
    v = _vecs(spark, sf_dir)
    q = F.broadcast(
        v.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    scored = (
        v.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "label", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"))
    )
    from currency_etl_pipeline_spark.operators.topk import top_k_per_group

    return top_k_per_group(
        scored, ["query_id"], [F.col("cos_sim").desc(), F.col("vec_id").asc()], k=10, descending=False
    ).select("query_id", "vec_id", "label", "cos_sim")


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv, label FROM embeddings),
    planes AS (SELECT vec_id - 10 AS plane_idx, dv AS pv FROM v WHERE vec_id BETWEEN 10 AND 17),
    sigs AS (
        SELECT v.vec_id, v.label, any_value(v.dv) AS dv,
               CAST(sum(CASE WHEN list_inner_product(v.dv, p.pv) >= 0
                             THEN CAST(pow(2, p.plane_idx) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
        FROM v CROSS JOIN planes p GROUP BY v.vec_id, v.label
    ),
    q AS (SELECT vec_id AS query_id, dv AS qv, bucket FROM sigs WHERE vec_id IN (0, 1, 2)),
    scored AS (
        SELECT q.query_id, s.vec_id, s.label,
               round({_COS_DUCK.format(a="s.dv", b="q.qv")}, 6) AS cos_sim
        FROM sigs s JOIN q ON s.bucket = q.bucket AND s.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, label, cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) <= 5
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH: 8 sign bits → 256
    buckets; candidates share the full signature; exact cosine only
    within buckets. Hyperplanes are data vectors 10..17 (deterministic,
    oracle-replayable). The scale path: the bucket equi-join replaces
    the brute-force crossJoin."""
    v = _vecs(spark, sf_dir)
    planes = F.broadcast(
        v.filter(F.col("vec_id").isin(*PLANE_IDS)).select(
            (F.col("vec_id") - 10).alias("plane_idx"), F.col("v").alias("pv")
        )
    )
    bit = F.when(dot(F.col("v"), F.col("pv")) >= 0, F.pow(F.lit(2.0), F.col("plane_idx")).cast("long")).otherwise(F.lit(0).cast("long"))
    sigs = (
        v.crossJoin(planes)
        .groupBy("vec_id", "label")
        .agg(F.any_value(F.col("v")).alias("dv"), F.sum(bit).cast("long").alias("bucket"))
    )
    q = F.broadcast(
        sigs.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"), F.col("dv").alias("qv"), F.col("bucket").alias("qbucket")
        )
    )
    scored = (
        sigs.join(q, (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", "vec_id", "label", F.round(cosine(F.col("dv"), F.col("qv")), 6).alias("cos_sim"))
    )
    from currency_etl_pipeline_spark.operators.topk import top_k_per_group

    return top_k_per_group(
        scored, ["query_id"], [F.col("cos_sim").desc(), F.col("vec_id").asc()], k=5, descending=False
    ).select("query_id", "vec_id", "label", "cos_sim")


# Multi-table LSH: 8 independent 4-plane signatures (plane vectors
# 30..61 — disjoint from queries 0..2, single-table planes 10..17 and
# the IVF centroids 20..27). One 8-bit signature recalls almost
# nothing on near-orthogonal embeddings (ann_recall_report measured
# 0-0.2; even OR-ing four 8-bit tables stayed at 0 — p^8 is ~3% for a
# 0.45-cosine neighbor). The working point trades signature LENGTH
# for table COUNT at the same 32-plane cost: collision probability
# 1-(1-p^b)^L with b=4, L=8 lifts a 0.45-cosine neighbor to ~0.8
# while random (p=1/2) pairs stay filtered at bucket granularity —
# the candidate set grows, which is exactly the cost the recall
# report's n_returned/recall columns exist to expose.
_MT_LO, _MT_TABLES, _MT_BITS = 30, 8, 4


@query(
    "ann_lsh_multitable_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv, label FROM embeddings),
    planes AS (
      SELECT (vec_id - {_MT_LO}) // {_MT_BITS} AS tbl,
             (vec_id - {_MT_LO}) % {_MT_BITS} AS plane_idx, dv AS pv
      FROM v WHERE vec_id BETWEEN {_MT_LO} AND {_MT_LO + _MT_TABLES * _MT_BITS - 1}
    ),
    sigs AS (
      SELECT v.vec_id, v.label, p.tbl, any_value(v.dv) AS dv,
             CAST(sum(CASE WHEN list_inner_product(v.dv, p.pv) >= 0
                           THEN CAST(pow(2, p.plane_idx) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      FROM v CROSS JOIN planes p GROUP BY v.vec_id, v.label, p.tbl
    ),
    q AS (SELECT vec_id AS query_id, tbl, dv AS qv, bucket FROM sigs WHERE vec_id IN (0, 1, 2)),
    cand AS (
      SELECT q.query_id, s.vec_id, any_value(s.label) AS label,
             any_value(s.dv) AS dv, any_value(q.qv) AS qv
      FROM sigs s JOIN q ON s.tbl = q.tbl AND s.bucket = q.bucket AND s.vec_id <> q.query_id
      GROUP BY q.query_id, s.vec_id
    )
    SELECT query_id, vec_id, label,
           round({_COS_DUCK.format(a="dv", b="qv")}, 6) AS cos_sim
    FROM cand
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) <= 5
    """,
)
def ann_lsh_multitable_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table random-hyperplane LSH: L=8 independent 4-bit
    signatures per vector, candidates = the UNION of same-bucket
    matches across tables (deduped by group-by, each scored once),
    exact cosine + top-5. The recall repair ``ann_recall_report``
    prescribes for the single-table variant: one signature's
    full-match probability is p^b (p = 1 - theta/pi; near zero at
    b=8 for these weakly-correlated embeddings), and OR-ing L tables
    lifts it to 1-(1-p^b)^L. Shortening b to 4 while raising L to 8
    keeps the plane cost identical (32 planes, one broadcast
    crossJoin) and moves a 0.45-cosine neighbor from ~0 to ~0.8
    collision probability — at the price of a larger candidate set,
    the tradeoff the recall report quantifies per method.

    Plan/scale: signatures are map-side (planes broadcast, map-side
    hash agg per (vec, tbl)); the candidate step is an equi-join on
    (tbl, bucket) — at 100 TB each table is a separate bucket-
    partitioned layout and probing stays partition-local; candidates
    dedup via the same hash agg that carries the vectors, so each
    candidate's exact cosine runs once no matter how many tables it
    collided in.
    """
    v = _vecs(spark, sf_dir)
    planes = F.broadcast(
        v.filter(
            F.col("vec_id").between(_MT_LO, _MT_LO + _MT_TABLES * _MT_BITS - 1)
        ).select(
            ((F.col("vec_id") - _MT_LO) / _MT_BITS).cast("int").alias("tbl"),
            ((F.col("vec_id") - _MT_LO) % _MT_BITS).alias("plane_idx"),
            F.col("v").alias("pv"),
        )
    )
    bit = F.when(
        dot(F.col("v"), F.col("pv")) >= 0,
        F.pow(F.lit(2.0), F.col("plane_idx")).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    sigs = (
        v.crossJoin(planes)
        .groupBy("vec_id", "label", "tbl")
        .agg(F.any_value(F.col("v")).alias("dv"), F.sum(bit).cast("long").alias("bucket"))
    )
    q = F.broadcast(
        sigs.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"),
            F.col("tbl").alias("qtbl"),
            F.col("dv").alias("qv"),
            F.col("bucket").alias("qbucket"),
        )
    )
    cand = (
        sigs.join(
            q,
            (F.col("tbl") == F.col("qtbl"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .groupBy("query_id", "vec_id")
        .agg(
            F.any_value("label").alias("label"),
            F.any_value("dv").alias("dv"),
            F.any_value("qv").alias("qv"),
        )
    )
    scored = cand.select(
        "query_id", "vec_id", "label",
        F.round(cosine(F.col("dv"), F.col("qv")), 6).alias("cos_sim"),
    )
    from currency_etl_pipeline_spark.operators.topk import top_k_per_group

    return top_k_per_group(
        scored, ["query_id"], [F.col("cos_sim").desc(), F.col("vec_id").asc()], k=5, descending=False
    ).select("query_id", "vec_id", "label", "cos_sim")


@query(
    "embedding_label_stats",
    oracle="""
    WITH v AS (
        SELECT label, CAST(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS DECIMAL(18,9)) AS norm
        FROM embeddings
    )
    SELECT label, count(*) AS n_vectors,
           round(CAST(sum(norm) AS DOUBLE) / count(*), 6) AS avg_norm,
           round(CAST(min(norm) AS DOUBLE), 6) AS min_norm,
           round(CAST(max(norm) AS DOUBLE), 6) AS max_norm
    FROM v GROUP BY label
    """,
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector stats; the per-row norm is deterministic double
    math, the cross-row mean goes through DECIMAL for order independence."""
    v = _vecs(spark, sf_dir)
    norm = F.sqrt(dot(F.col("v"), F.col("v"))).cast("decimal(18,9)")
    t = v.select("label", norm.alias("norm"))
    return t.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.sum("norm").cast("double") / F.count(F.lit(1)), 6).alias("avg_norm"),
        F.round(F.min("norm").cast("double"), 6).alias("min_norm"),
        F.round(F.max("norm").cast("double"), 6).alias("max_norm"),
    )


@query(
    "near_dup_embeddings",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings WHERE vec_id < 300)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_COS_DUCK.format(a="a.dv", b="b.dv")}, 6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_COS_DUCK.format(a="a.dv", b="b.dv")} >= 0.4
    """,
)
def near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding-cosine near-dup over a FIXED 300-vector slice
    — oracle/recall scaffolding only. This is deliberately the quadratic
    baseline (broadcast nested-loop, bounded by the slice declaration);
    the catalog's scale path is ``near_dup_embeddings_lsh`` below, which
    routes candidates through hyperplane buckets and never materializes
    the crossJoin."""
    v = _vecs(spark, sf_dir).filter(F.col("vec_id") < 300).select("vec_id", "v")
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= 0.4)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )


NEARDUP_PLANE_IDS = tuple(range(10, 26))  # 16 planes -> 4 bands x 4 bits
_ND_BANDS, _ND_BITS = 4, 4


# Shared CTE chain: corpus → deterministic hyperplanes → banded
# signatures → same-bucket candidate pairs. Used by the pair query and
# the cluster composition below.
_ND_LSH_CTES = """v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
    planes AS (SELECT vec_id - 10 AS plane_idx, dv AS pv FROM v WHERE vec_id BETWEEN 10 AND 25),
    sigs AS (
        SELECT v.vec_id, p.plane_idx // 4 AS band, any_value(v.dv) AS dv,
               CAST(sum(CASE WHEN list_inner_product(v.dv, p.pv) >= 0
                             THEN CAST(pow(2, p.plane_idx % 4) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
        FROM v CROSS JOIN planes p GROUP BY v.vec_id, p.plane_idx // 4
    ),
    cand AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               any_value(a.dv) AS va, any_value(b.dv) AS vb
        FROM sigs a JOIN sigs b
          ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    )"""


@query(
    "near_dup_embeddings_lsh",
    oracle=f"""
    WITH {_ND_LSH_CTES}
    SELECT vec_a, vec_b, round({_COS_DUCK.format(a="c.va", b="c.vb")}, 6) AS cos_sim
    FROM cand c
    WHERE {_COS_DUCK.format(a="c.va", b="c.vb")} >= 0.4
    """,
)
def near_dup_embeddings_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup over the WHOLE corpus via banded
    hyperplane LSH: 16 sign bits (deterministic planes, vectors 10..25)
    split into 4 bands of 4 bits; candidate pairs agree on ANY band's
    4-bit bucket (equi-join on (band, bucket)); exact cosine ≥ 0.4
    verifies candidates only. This is the catalog's scale path for
    embedding dedup — ``near_dup_embeddings`` above is the all-pairs
    scaffolding it is checked against.

    Plan: signatures are NARROW — (vec_id, band, bucket) longs from one
    corpus pass against 16 broadcast planes + one groupBy(vec_id, band)
    shuffle; candidates = a (band, bucket) equi-join of the signature
    table with itself (identical subtrees → one exchange, reused) and
    a distinct() over bare id pairs, so the multi-band dedup shuffles
    two longs per candidate, never the vectors. Vectors (with norms
    precomputed once per vector) join back by id only for the surviving
    unique pairs, leaving ONE dot product per pair. Cost is Σ|bucket|²
    per band instead of n²; banding trades candidate count for recall
    (more bands with fewer bits → higher recall, more candidates). No
    nested-loop join anywhere (plan-test pinned)."""
    sigs = _banded_sigs(spark, sf_dir)
    a = sigs.select(F.col("vec_id").alias("vec_a"), "band", "bucket")
    b = sigs.select(F.col("vec_id").alias("vec_b"), "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    # sqrt(dot(v,v)) precomputed per vector is the bitwise-identical
    # double the oracle's per-pair formula produces — parity holds.
    vv = _vecs(spark, sf_dir).select(
        "vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm")
    )
    scored = (
        pairs.join(
            vv.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")),
            "vec_a",
        )
        .join(
            vv.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")),
            "vec_b",
        )
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return scored.filter(cos >= 0.4).select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))


def _banded_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow (vec_id, band, 4-bit bucket) — one row per vector per
    band, hyperplane sign bits packed per band. Three longs per row so
    the candidate self-join and pair dedup never shuffle vectors."""
    v = _vecs(spark, sf_dir)
    planes = F.broadcast(
        v.filter(F.col("vec_id").isin(*NEARDUP_PLANE_IDS)).select(
            (F.col("vec_id") - 10).alias("plane_idx"), F.col("v").alias("pv")
        )
    )
    bit = F.when(
        dot(F.col("v"), F.col("pv")) >= 0,
        F.pow(F.lit(2.0), F.col("plane_idx") % _ND_BITS).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        v.crossJoin(planes)
        .groupBy("vec_id", (F.col("plane_idx") / _ND_BITS).cast("int").alias("band"))
        .agg(F.sum(bit).cast("long").alias("bucket"))
    )


@query(
    "embedding_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_ND_LSH_CTES},
    pairs AS MATERIALIZED (
        SELECT vec_a, vec_b FROM cand c
        WHERE {_COS_DUCK.format(a="c.va", b="c.vb")} >= 0.4
    ), edges AS MATERIALIZED (
        SELECT vec_a AS a, vec_b AS b FROM pairs
        UNION SELECT vec_b, vec_a FROM pairs
    ), reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS vec_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
    """,
)
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters in EMBEDDING space: connected components over
    the banded-LSH near-dup pair graph (`near_dup_embeddings_lsh`'s
    edge set) — the cross-family composition that turns pairwise
    vector similarity into keep-one-per-cluster pruning, exactly as
    `dedup_clusters` does for text shingles.

    Plan: the edge set is the pinned no-nested-loop LSH pipeline; the
    labels come from the same iterative min-label propagation
    (operators/graph.py, one shuffle per superstep, bounded by cluster
    diameter). The oracle replays the closure with a recursive CTE, so
    the driver check covers LSH candidate generation, cosine
    verification, AND the iterative algorithm in one row-hash. The
    pairs/edges CTEs are MATERIALIZED (r10): DuckDB inlines plain CTEs
    into the recursive step, re-running the whole LSH pipeline per
    closure iteration — >9 min at sf0.1 vs 110 s materialized, values
    identical (the sequential_dedup_admission precedent, FIXTURES).
    """
    from currency_etl_pipeline_spark.operators.graph import connected_components

    pairs = near_dup_embeddings_lsh(spark, sf_dir).select("vec_a", "vec_b")
    return connected_components(pairs, "vec_a", "vec_b").select(
        F.col("node").alias("vec_id"), F.col("component").alias("cluster_id")
    )


@query(
    "embedding_l2_normalize",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
    ), n AS (
        SELECT vec_id, label, dv,
               sqrt(list_inner_product(dv, dv)) AS norm
        FROM v
    ), u AS (
        SELECT vec_id, label, norm,
               list_transform(dv, x -> x / norm) AS uv
        FROM n WHERE norm > 0
    )
    SELECT vec_id, label,
           round(norm, 6) AS pre_norm,
           round(sqrt(list_inner_product(uv, uv)), 6) AS post_norm,
           round(uv[1], 6) AS u0
    FROM u
    """,
)
def embedding_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization of the embedding column — the preprocessing
    step every cosine-based ANN index assumes (unit vectors turn
    cosine into a plain dot product, halving the per-candidate math in
    the LSH/IVF probes). Zero-norm vectors are dropped explicitly
    (division would produce NaN/NULL junk downstream).

    Output pins the contract: pre-norm, post-norm (must be 1 within
    rounding — checked value-exactly against the oracle, which replays
    the identical transform/aggregate lambda math), and the first
    normalized component as a spot value. Per-row double division and
    the `aggregate` dot product are IEEE-deterministic, so both
    engines agree bit-for-bit before the 6dp edge rounding.

    Plan: pure map-side codegen over one scan — transform() + the
    zip_with/aggregate dot, no shuffle at all; at 100 TB this runs at
    scan bandwidth and the normalized corpus writes straight back out.
    """
    v = _vecs(spark, sf_dir)
    norm = F.sqrt(dot(F.col("v"), F.col("v")))
    n = v.select("vec_id", "label", "v", norm.alias("norm")).filter(F.col("norm") > 0)
    uv = F.transform(F.col("v"), lambda x: x / F.col("norm"))
    u = n.select("vec_id", "label", "norm", uv.alias("uv"))
    return u.select(
        "vec_id",
        "label",
        F.round("norm", 6).alias("pre_norm"),
        F.round(F.sqrt(dot(F.col("uv"), F.col("uv"))), 6).alias("post_norm"),
        F.round(F.element_at("uv", 1), 6).alias("u0"),
    )


# int8 quantization: per-vector symmetric scale s = 127/max|x|, code =
# floor(x*s + 0.5) — one explicit rounding rule shared verbatim by both
# engines (F.round is HALF_UP, DuckDB round() half-away-from-zero; the
# floor form sidesteps the difference). The scales cancel inside
# cosine, so quantized scoring needs ONLY integer dot products:
# cos_q = dot(qa,qb) / (sqrt(dot(qa,qa)) * sqrt(dot(qb,qb))).
# |dot| <= 127^2 * 64-dim ~ 1.03e6 << 2^53, so double accumulation of
# the integer-valued codes is exact — bit-identical across engines and
# partition counts.
_QUANT_DUCK = (
    "list_transform(dv, x -> floor(x * (127.0 / "
    "list_max(list_transform(dv, y -> abs(y)))) + 0.5))"
)


def quantize_int8(v: Column) -> Column:
    """Symmetric per-vector int8 codes as integer-valued doubles."""
    scale = F.lit(127.0) / F.array_max(F.transform(v, F.abs))
    return F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("double"))


@query(
    "ann_int8_rerank_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv, label FROM embeddings
        WHERE list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) > 0
    ),
    qz AS (SELECT vec_id, label, dv, {_QUANT_DUCK} AS qv FROM v),
    q AS (SELECT vec_id AS query_id, qv AS qqv, dv AS qdv FROM qz WHERE vec_id IN (0, 1, 2)),
    cand AS (
        SELECT q.query_id, z.vec_id, z.label, z.dv, q.qdv,
               round({_COS_DUCK.format(a="z.qv", b="q.qqv")}, 6) AS qcos_sim
        FROM qz z CROSS JOIN q
        WHERE z.vec_id <> q.query_id
        QUALIFY row_number() OVER (PARTITION BY q.query_id
                                   ORDER BY qcos_sim DESC, z.vec_id ASC) <= 30
    )
    SELECT query_id, vec_id, label, qcos_sim,
           round({_COS_DUCK.format(a="dv", b="qdv")}, 6) AS cos_sim
    FROM cand
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, vec_id ASC) <= 10
    """,
)
def ann_int8_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN with int8 scalar quantization: score the WHOLE
    corpus with integer-only dot products on 4x-smaller codes, keep the
    quantized top-30 per query, then re-rank only those candidates with
    exact full-precision cosine and emit the top-10 — the standard
    quantized-scan + exact-re-rank shape (FAISS SQ8 / IVF_SQ8 families,
    public literature).

    Why it scales: the first stage is the only full-corpus pass and it
    touches int8 codes — 4x less scan/shuffle bandwidth than the float
    corpus and no multiplies wider than 16 bits on a real engine; the
    exact stage reads full vectors for 30 rows/query, not 500M. The
    quantized score orders by round(qcos, 6) with a vec_id tie-break
    so candidate sets are engine- and partition-count-independent;
    recall vs the exact baseline is pinned in tests/test_scale_plans.py.
    """
    from currency_etl_pipeline_spark.operators.topk import top_k_per_group

    v = _vecs(spark, sf_dir).filter(F.array_max(F.transform(F.col("v"), F.abs)) > 0)
    qz = v.select("vec_id", "label", quantize_int8(F.col("v")).alias("qv"))
    q = F.broadcast(
        v.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"),
            quantize_int8(F.col("v")).alias("qqv"),
            F.col("v").alias("qdv"),
        )
    )
    # The full-corpus pass and the top-30 window move ONLY
    # (query_id, vec_id, label, qcos_sim) — never float vectors; the
    # floats rejoin below for the 30 survivors/query (and the probe
    # floats ride the same broadcast q).
    scored = (
        qz.crossJoin(q.select("query_id", "qqv"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", "label",
            F.round(cosine(F.col("qv"), F.col("qqv")), 6).alias("qcos_sim"),
        )
    )
    cand = top_k_per_group(
        scored, ["query_id"], [F.col("qcos_sim").desc(), F.col("vec_id").asc()], k=30, descending=False
    )
    reranked = (
        cand.join(v.select("vec_id", F.col("v").alias("dv")), "vec_id")
        .join(q.select("query_id", "qdv"), "query_id")
        .select(
            "query_id", "vec_id", "label", "qcos_sim",
            F.round(cosine(F.col("dv"), F.col("qdv")), 6).alias("cos_sim"),
        )
    )
    return top_k_per_group(
        reranked, ["query_id"], [F.col("cos_sim").desc(), F.col("vec_id").asc()], k=10, descending=False
    ).select("query_id", "vec_id", "label", "qcos_sim", "cos_sim")


# IVF quantizer health: the incremental-maintenance decision metric
# (sources/ann_index.py appends new vectors against FROZEN centroids;
# this report says when that stops being safe). Vectors landing at or
# after _DRIFT_SPLIT model the post-build appends.
_DRIFT_CENTROID_IDS = tuple(range(20, 28))  # advanced.py's CENTROID_IDS
_DRIFT_SPLIT = 400
_DRIFT_THRESHOLD_E6 = 180_000  # micro-units; splits the sf0.01 cells
# 5 True / 3 False: exemplar centroids sit 0.17-0.26 from their cell
# means there, so the flag is exercised in BOTH directions by the
# driver's correctness sweep

# Scale-9 quantization of one double component, DuckDB side — the SQL
# twin of sources/ann_index.quantize_vec9 (exact DECIMAL intermediate,
# half-up double→DECIMAL(19,9) cast in both engines).
_Q9_DUCK = "CAST(CAST({x} AS DECIMAL(19,9)) * 1000000000 AS BIGINT)"


@query(
    "ivf_centroid_drift_report",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
    cents AS (SELECT vec_id - 20 AS cid, dv AS cv FROM v WHERE vec_id BETWEEN 20 AND 27),
    pair AS (
        -- exact integer cosine partials per (vector, centroid): the
        -- SQL twin of ann_index._ranked_cells_exact — scale-9
        -- quantized components, HUGEINT dot/norm sums (order-free)
        SELECT v.vec_id, c.cid,
               sum(CAST({_Q9_DUCK.format(x="v.dv[d.i]")} AS HUGEINT)
                   * {_Q9_DUCK.format(x="c.cv[d.i]")}) AS dot,
               sum(CAST({_Q9_DUCK.format(x="v.dv[d.i]")} AS HUGEINT)
                   * {_Q9_DUCK.format(x="v.dv[d.i]")}) AS na,
               sum(CAST({_Q9_DUCK.format(x="c.cv[d.i]")} AS HUGEINT)
                   * {_Q9_DUCK.format(x="c.cv[d.i]")}) AS nb
        FROM v CROSS JOIN cents c CROSS JOIN generate_series(1, 64) AS d(i)
        GROUP BY v.vec_id, c.cid
    ),
    assigned AS (
        SELECT p.vec_id, p.cid
        FROM pair p
        QUALIFY row_number() OVER (
            PARTITION BY p.vec_id
            ORDER BY round(CAST(p.dot AS DOUBLE)
                           / sqrt(CAST(p.na AS DOUBLE) * CAST(p.nb AS DOUBLE)), 6) DESC,
                     p.cid ASC
        ) = 1
    ),
    per_dim AS (
        SELECT a.cid, d.i,
               count(*) AS cnt,
               sum(CASE WHEN a.vec_id >= {_DRIFT_SPLIT} THEN 1 ELSE 0 END) AS fcnt,
               CAST(CAST(sum(CAST(v.dv[d.i] AS DECIMAL(28,9))) AS DECIMAL(19,9))
                    * 1000000000 AS BIGINT) AS sq
        FROM assigned a JOIN v ON a.vec_id = v.vec_id
        CROSS JOIN generate_series(1, 64) AS d(i)
        GROUP BY a.cid, d.i
    ),
    quant AS (
        -- scale-9 fixed-point mean (round-half-up integer division)
        -- and centroid components: the exact_drift discipline — all
        -- float work deferred to one fixed-form expression below
        SELECT p.cid, p.cnt, p.fcnt,
               CASE WHEN p.sq >= 0 THEN (p.sq + p.cnt // 2) // p.cnt
                    ELSE -((-p.sq + p.cnt // 2) // p.cnt) END AS mq,
               {_Q9_DUCK.format(x="c.cv[p.i]")} AS aq
        FROM per_dim p JOIN cents c ON p.cid = c.cid
    ),
    cell AS (
        -- CAST: DuckDB types sum(CASE WHEN..THEN 1 ELSE 0 END) as
        -- HUGEINT (int128) and max() propagates it; the driver's value
        -- hash serializes int128 differently from int64, which kept
        -- this query rows/schema-green but hash-red for three rounds
        -- (r6-r8) while local value comparison was exact. Every other
        -- oracle normalizes the same construct (e.g. advanced.py
        -- ann_recall_report) — this was the catalog's only HUGEINT
        -- output column.
        SELECT cid, max(cnt) AS n, CAST(max(fcnt) AS BIGINT) AS n_new,
               sum(CAST(aq AS HUGEINT) * mq) AS dot,
               sum(CAST(aq AS HUGEINT) * aq) AS na,
               sum(CAST(mq AS HUGEINT) * mq) AS nb
        FROM quant GROUP BY cid
    ),
    final AS (
        SELECT cid, n, n_new,
               CAST(round((1 - CAST(dot AS DOUBLE)
                               / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
                          * 1000000.0, 0) AS BIGINT) AS drift_e6
        FROM cell
    )
    SELECT cid, n, n_new, drift_e6, drift_e6 > {_DRIFT_THRESHOLD_E6} AS recluster
    FROM final
    """,
)
def ivf_centroid_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell IVF quantizer drift over the full corpus: every vector
    assigned to its nearest stored centroid (the frozen quantizer), and
    per cell the member count, the count of post-build arrivals
    (vec_id >= split — the appended population), and
    drift_e6 = round((1 − cosine(stored centroid, exact cell mean))
    × 1e6) as BIGINT micro-units. ``recluster`` flags cells past the
    threshold — the metric sources/ann_index.centroid_drift_report
    computes over a MATERIALIZED index; this filesystem-free twin lets
    the driver hash-check the math end to end (same cell_mean_vectors
    code path).

    r8: the query surface is now integer-only END TO END. r7 made the
    drift edge exact but left ASSIGNMENT ranking on a raw double
    cosine fold — Spark's sequential `aggregate` vs DuckDB's
    `list_inner_product` kernel can reassociate a sum by one ulp,
    flipping the 6 dp round and moving a boundary vector between
    cells (the r7 hash-red signature: 8 rows, schema green, values
    off). Now BOTH engines rank by the same scale-9 quantized
    integer-partial cosine (`_ranked_cells_exact` / the oracle's
    `pair` CTE), and the output carries drift as BIGINT micro-units
    with `recluster` from an integer compare — no double appears in
    the comparison surface at all.

    r9: the r8 prediction held — the residual red WAS a serialization
    artifact, not math. DuckDB typed the oracle's `n_new` column
    HUGEINT (`sum(CASE..)` → int128, propagated through `max`), the
    only int128 output column in the whole catalog, and the driver's
    value hash distinguishes int128 from int64. The oracle now casts
    it to BIGINT; an oracle-wide output-type lint
    (tests/test_oracle_types.py) keeps the class out forever.

    Plan/scale: assignment is the map-side broadcast crossJoin (O(kn),
    no shuffle); the mean is posexplode → per-(cid, dim) DECIMAL
    partials, combined map-side so the exchange carries |cells|×d rows;
    the centroid join is a broadcast of k rows. Nothing scales with
    corpus size past the first map stage.
    """
    from currency_etl_pipeline_spark.sources.ann_index import (
        _ranked_cells_exact,
        cell_mean_vectors,
        exact_drift_e6,
    )

    v = _vecs(spark, sf_dir)
    cents = v.filter(F.col("vec_id").isin(*_DRIFT_CENTROID_IDS)).select(
        (F.col("vec_id") - 20).alias("cid"), F.col("v").alias("cv")
    )
    assigned = (
        _ranked_cells_exact(v.select("vec_id", "v"), cents)
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("v").alias("dv"), "cid")
    )
    mean = cell_mean_vectors(
        assigned, vec_col="dv", flag=F.col("vec_id") >= _DRIFT_SPLIT, scaled=True
    )
    return (
        mean.join(F.broadcast(cents), "cid")
        .select(
            "cid",
            "n",
            F.col("n_flagged").alias("n_new"),
            exact_drift_e6(F.col("cv"), F.col("mqv")).alias("drift_e6"),
        )
        .withColumn("recluster", F.col("drift_e6") > F.lit(_DRIFT_THRESHOLD_E6))
    )


# Product quantization geometry: M=8 subspaces x 8 dims over the 64-dim
# embeddings; K=16 codewords per subspace taken from fixed corpus
# exemplars (vec_ids 40..55 -> code_idx 0..15), the same
# deterministic-quantizer device as the IVF family's exemplar centroids
# — which is what makes the whole PQ pipeline oracle-expressible.
_PQ_CB_LO, _PQ_K, _PQ_M, _PQ_DSUB = 40, 16, 8, 8


def _pq_oracle(v_cte: str, k: int = _PQ_K, topn: int = 10) -> str:
    """The PQ/ADC oracle parameterized over the vector CTE (raw
    embeddings for pq_ann_topk; L2-normalized for the _normalized
    twin), the codebook size k, and the emitted top-n — everything
    downstream of `v` is shared verbatim."""
    return f"""
    WITH v AS ({v_cte}),
    sub AS (
      SELECT vec_id, label, s.s,
             list_transform(dv[{_PQ_DSUB} * s.s + 1 : {_PQ_DSUB} * s.s + {_PQ_DSUB}],
                            x -> {_Q9_DUCK.format(x="x")}) AS sv
      FROM v CROSS JOIN generate_series(0, {_PQ_M - 1}) AS s(s)
    ),
    cb AS (
      SELECT vec_id - {_PQ_CB_LO} AS code_idx, s, sv AS cv
      FROM sub WHERE vec_id BETWEEN {_PQ_CB_LO} AND {_PQ_CB_LO + k - 1}
    ),
    encd AS (
      -- exact integer squared-L2 of every (vector, subspace, codeword)
      SELECT t.vec_id, t.label, t.s, c.code_idx,
             sum(CAST(t.sv[d.d] - c.cv[d.d] AS HUGEINT)
                 * (t.sv[d.d] - c.cv[d.d])) AS dist
      FROM sub t JOIN cb c ON t.s = c.s
      CROSS JOIN generate_series(1, {_PQ_DSUB}) AS d(d)
      GROUP BY t.vec_id, t.label, t.s, c.code_idx
    ),
    codes AS (
      SELECT vec_id, label, s, code_idx FROM encd
      QUALIFY row_number() OVER (PARTITION BY vec_id, s
                                 ORDER BY dist ASC, code_idx ASC) = 1
    ),
    qtab AS (
      SELECT vec_id AS query_id, s, code_idx, dist
      FROM encd WHERE vec_id IN (0, 1, 2)
    ),
    adc AS (
      SELECT q.query_id, c.vec_id, max(c.label) AS label, sum(q.dist) AS score
      FROM codes c JOIN qtab q ON c.s = q.s AND c.code_idx = q.code_idx
      WHERE c.vec_id <> q.query_id
      GROUP BY q.query_id, c.vec_id
    )
    SELECT query_id, vec_id, label, rank,
           CAST(score // 1000000 AS BIGINT) AS score_micro
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY score ASC, vec_id ASC) AS rank
          FROM adc)
    WHERE rank <= {topn}
    """


def _pq_adc_pipeline(
    spark: SparkSession, base: DataFrame, k: int = _PQ_K, topn: int = 10
) -> DataFrame:
    """Shared PQ encode + ADC search over a (vec_id, label, q9) base:
    subspace explode → exemplar codebook (k codewords) → exact-integer
    encode → broadcast query tables → 8-lookup ADC scores → top-n per
    query. See pq_ann_topk's docstring for the full plan/scale story."""
    from pyspark.sql import Window

    sub = base.select(
        "vec_id",
        "label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice("q9", s * _PQ_DSUB + 1, _PQ_DSUB).alias("sv"),
                    )
                    for s in range(_PQ_M)
                ]
            )
        ).alias("sp"),
    ).select("vec_id", "label", F.col("sp.s").alias("s"), F.col("sp.sv").alias("sv"))
    cb = sub.filter(
        F.col("vec_id").between(_PQ_CB_LO, _PQ_CB_LO + k - 1)
    ).select((F.col("vec_id") - _PQ_CB_LO).alias("code_idx"), "s", F.col("sv").alias("cv"))
    dist = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b).cast("decimal(38,0)") * (a - b)),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: acc + x,
    )
    encd = sub.join(F.broadcast(cb), "s").select(
        "vec_id", "label", "s", "code_idx", dist.alias("dist")
    )
    wenc = Window.partitionBy("vec_id", "s").orderBy(
        F.col("dist").asc(), F.col("code_idx").asc()
    )
    codes = (
        encd.withColumn("rn", F.row_number().over(wenc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "s", "code_idx")
    )
    qtab = encd.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "s", "code_idx", "dist"
    )
    adc = (
        codes.join(F.broadcast(qtab), ["s", "code_idx"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.max("label").alias("label"), F.sum("dist").alias("score"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("score").asc(), F.col("vec_id").asc())
    return (
        adc.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= topn)
        .select(
            "query_id",
            "vec_id",
            "label",
            "rank",
            F.expr("CAST(score DIV 1000000 AS BIGINT)").alias("score_micro"),
        )
    )


@query(
    "pq_ann_topk",
    oracle=_pq_oracle("SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings"),
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance (ADC) search —
    the memory-scaling member of the ANN family (brute force: exact;
    LSH/multitable: hash buckets; IVF/IVF_SQ8: partition pruning; PQ:
    8 code BYTES per vector regardless of dimensionality, the FAISS
    `PQ8` shape). Encode: each vector's 8 subspaces snap to the nearest
    of 16 codeword sub-vectors (squared L2, code_idx tie-break). Search
    (ADC): the query precomputes its 8×16 distance table; a candidate's
    score is the sum of 8 TABLE LOOKUPS — no vector math per candidate,
    which is the entire point of PQ at serving time.

    Engine-exactness makes even this fully hash-checkable (the other
    approximate indexes pin recall; PQ pins the exact answer): both
    sides quantize to scale-9 integers, every codeword distance is an
    exact integer HUGEINT/DECIMAL(38,0) sum, encoding and top-k rank on
    (integer, id) tie-broken orders, and the output score is the exact
    integer DIV 1e6 (fits BIGINT). The codebook reuses the exemplar-
    quantizer device of the IVF family (fixed corpus vec_ids), so the
    oracle derives the identical codebook from the same relation.

    Plan/scale: ONE full corpus scan (the codebook and query slices are
    pushed-down point reads of 16 + 3 ids); encoding is a broadcast
    fanout (8 subspaces × 16 codewords per row, map-side); ADC joins
    the 8-row-per-vector code table against a 384-row broadcast and
    hash-aggregates on (query, vec) — at 100 TB the shuffled width is
    8 small ints per vector, never the vectors. Recall lever: K and M
    (a trained codebook replaces the exemplars exactly as
    ivf_ann_topk_trained does for IVF).

    PRODUCTION STEERING (the near_dup_embeddings → LSH-twin pattern):
    ADC-only recall@5 is MEASURED at 0.2–0.4 on this corpus
    (ann_recall_report rows `pq`/`pqn`; cause is codebook coarseness,
    the rejected-normalization experiment is pq_ann_topk_normalized).
    Serving searches should use ``pq_rerank_topk`` (ADC shortlist +
    exact re-rank, recall 1.0/1.0/0.8) or the materialized
    ``search_ivfpq_index(..., rerank=L)``, which recovers float-probe
    recall exactly (pinned in tests/test_incremental.py). This query
    stays as the hash-exact ADC pipeline definition and the report's
    baseline row.
    """
    from currency_etl_pipeline_spark.sources.ann_index import quantize_vec9

    v = _vecs(spark, sf_dir)
    base = v.select("vec_id", "label", quantize_vec9(F.col("v")).alias("q9"))
    return _pq_adc_pipeline(spark, base)


# Normalized-variant vector CTE: the same per-row IEEE division the
# hash-green embedding_l2_normalize oracle replays (Spark's aggregate
# fold and DuckDB's list_inner_product are both sequential left
# folds, so the norm — and therefore every normalized component — is
# bit-identical across engines before quantization).
_PQN_V_CTE = """
        SELECT vec_id, label, list_transform(dv, x -> x / norm) AS dv
        FROM (SELECT vec_id, label, dv,
                     sqrt(list_inner_product(dv, dv)) AS norm
              FROM (SELECT vec_id, label,
                           CAST(embedding AS DOUBLE[]) AS dv
                    FROM embeddings) rawv) normv
        WHERE norm > 0
    """


@query("pq_ann_topk_normalized", oracle=_pq_oracle(_PQN_V_CTE))
def pq_ann_topk_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC over L2-NORMALIZED embeddings — the hypothesis test the
    r9 `ann_recall_report` measurement demanded. Raw PQ ranks by
    squared L2 while the exact baseline ranks by cosine, and on
    non-unit vectors those orders disagree; on unit vectors
    ||a-b||² = 2 − 2·cos(a,b) makes them coincide, so normalizing
    upstream was the predicted repair for PQ's 0.2/0.4/0.2 recall.
    MEASURED OUTCOME: the hypothesis is REJECTED on this corpus — the
    synthetic embeddings are already unit-norm (norms 1.0 ± 1.1e-7,
    verified over the full sf0.01 table), so normalization is an
    identity transform and this query returns the exact same top-10
    sets as pq_ann_topk (set equality verified per query; the report
    shows identical `pq`/`pqn` rows). The real recall loss is
    CODEBOOK COARSENESS — 16 exemplar codewords reconstruct an 8-dim
    subspace badly — which is what `pq_rerank_topk` (wider codebook +
    ADC shortlist + exact re-rank) actually repairs.

    The query stays in the catalog for two reasons: it is the
    measurement that rejected the hypothesis (the report's pqn row IS
    the evidence), and normalize-then-PQ is the correct serving
    configuration whenever the upstream corpus is NOT unit-norm — the
    guard costs one map-side pass and makes PQ's ranking metric match
    cosine by construction instead of by luck of the data.

    Engine-exactness: normalization is one per-row IEEE sqrt+division
    over a sequential-fold dot product (the embedding_l2_normalize
    contract, hash-green since r5); both engines then quantize the
    identical doubles with the shared scale-9 DECIMAL rule, and
    everything downstream is the shared integer PQ pipeline. Plan is
    identical to pq_ann_topk — normalization adds zero shuffles (pure
    map-side codegen before the subspace explode). Codebook exemplars
    normalize too, on both sides, so the quantizer stays consistent.
    """
    from currency_etl_pipeline_spark.sources.ann_index import quantize_vec9

    v = _vecs(spark, sf_dir)
    norm = F.sqrt(dot(F.col("v"), F.col("v")))
    n = v.select("vec_id", "label", "v", norm.alias("norm")).filter(F.col("norm") > 0)
    uv = F.transform(F.col("v"), lambda x: x / F.col("norm"))
    base = n.select("vec_id", "label", quantize_vec9(uv).alias("q9"))
    return _pq_adc_pipeline(spark, base)


# Refine-step geometry: wider 32-codeword codebook + 100-candidate ADC
# shortlist, chosen by measurement (containment of the true top-5 in
# the shortlist at sf0.01: K=16/L=10 gave 0.2/0.4/0.2; K=32/L=100
# gives 1.0/1.0/0.8 — shortlist width dominates codebook size).
_PQR_K, _PQR_SHORTLIST = 32, 100

_PQ_RAW_V_CTE = "SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings"


@query(
    "pq_rerank_topk",
    oracle=f"""
    WITH short AS ({_pq_oracle(_PQ_RAW_V_CTE, k=_PQR_K, topn=_PQR_SHORTLIST)}),
    v AS ({_PQ_RAW_V_CTE}),
    scored AS (
        SELECT s.query_id, s.vec_id, s.label,
               round({_COS_DUCK.format(a="cv.dv", b="qv.dv")}, 6) AS cos_sim
        FROM short s
        JOIN v qv ON qv.vec_id = s.query_id
        JOIN v cv ON cv.vec_id = s.vec_id
    )
    SELECT query_id, vec_id, label, cos_sim, rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, vec_id ASC) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
)
def pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC + exact re-rank — the repair the r9 recall measurements
    actually support (the FAISS `IVFPQ,Refine` recipe). The pqn
    experiment rejected the normalization hypothesis (corpus already
    unit-norm), leaving codebook coarseness as the measured recall
    killer; the effective levers, measured before building (see
    _PQR_K/_PQR_SHORTLIST), are a wider codebook and above all a WIDER
    SHORTLIST that exact scoring then fixes up: ADC ranks 100
    candidates per query with 8 table lookups each, and only those 100
    pay the full 64-dim cosine. End-to-end recall@5 measured in
    ann_recall_report (method `pqr`): 1.0/1.0/0.8 at sf0.01 vs raw
    PQ's 0.2/0.4/0.2 — the 20% residual is shortlist containment,
    tunable by L with linear cost.

    Plan/scale: the shared PQ pipeline's cost story unchanged (one
    corpus scan, codes shuffle as 8 small ints per vector); the refine
    step joins the ≤ |Q|·L shortlist — broadcast-sized by
    construction — back to the corpus for candidate vectors, so exact
    scoring touches L rows per query, not the corpus. At 100 TB this
    is the standard serving shape: memory-resident codes ranked
    first, then one pushed-down point-read batch per query for the
    shortlist's full vectors.
    """
    from pyspark.sql import Window

    from currency_etl_pipeline_spark.sources.ann_index import quantize_vec9

    v = _vecs(spark, sf_dir)
    base = v.select("vec_id", "label", quantize_vec9(F.col("v")).alias("q9"))
    short = _pq_adc_pipeline(spark, base, k=_PQR_K, topn=_PQR_SHORTLIST)
    qv = F.broadcast(
        v.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    scored = (
        v.join(F.broadcast(short.select("query_id", "vec_id")), "vec_id")
        .join(qv, "query_id")
        .select(
            "query_id",
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", "label", "cos_sim", "rank")
    )


@query(
    "label_centroid_similarity",
    oracle=f"""
    WITH ex AS (
        -- the fixture's embedding dim is fixed at 64 (the drift/PQ
        -- oracles' generate_series convention)
        SELECT label, d.i AS i,
               {_Q9_DUCK.format(x="embedding[d.i]")} AS xq
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d
    ), sv AS (
        SELECT label, i, CAST(sum(xq) AS BIGINT) AS s
        FROM ex GROUP BY label, i
    ), nrm AS (
        SELECT label, sum(CAST(s AS HUGEINT) * s) AS nn
        FROM sv GROUP BY label
    ), cnt AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY label
    ), dotp AS (
        SELECT a.label AS la, b.label AS lb,
               sum(CAST(a.s AS HUGEINT) * b.s) AS dp
        FROM sv a JOIN sv b ON a.i = b.i AND a.label < b.label
        GROUP BY 1, 2
    )
    SELECT CAST(d.la AS BIGINT) AS label_a, CAST(d.lb AS BIGINT) AS label_b,
           ca.n AS n_a, cb.n AS n_b,
           CASE WHEN na.nn = 0 OR nb.nn = 0 THEN NULL
                ELSE round(CAST(d.dp AS DOUBLE)
                           / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))),
                           6)
           END AS cosine
    FROM dotp d
    JOIN nrm na ON na.label = d.la
    JOIN nrm nb ON nb.label = d.lb
    JOIN cnt ca ON ca.label = d.la
    JOIN cnt cb ON cb.label = d.lb
    """,
)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus embedding GEOMETRY report: pairwise cosine between
    per-label centroids — which classes/domains are semantically
    adjacent. This is the mixture-design companion to the ANN family:
    ann_recall_report grades retrieval, this tells you WHICH labels an
    approximate index will confuse first (adjacent centroids share IVF
    cells) and which domain pairs a contamination check should
    cross-examine.

    Exactness without normalizing by counts: the centroid is
    (Σv)/n per label, but cosine is scale-invariant, so the 1/n
    factors CANCEL — cos(Ā, B̄) = Σ(sa·sb) / (‖sa‖·‖sb‖) on the raw
    per-dimension SUM vectors. Components quantize at scale 9 (the
    half-up DECIMAL(19,9) cast both engines share), per-(label, dim)
    sums are exact BIGINTs, dot/norms are exact HUGEINT/DECIMAL(38)
    products, and each output is ONE fixed-form double expression
    (6 dp edge round; all-zero centroids guard to NULL in both
    engines).

    Plan/scale: one posexplode scan → (label, dim) hash agg — the
    shuffle carries |labels|×64 longs, metadata-sized regardless of
    corpus row count; everything after (norms, the dim-keyed
    self-join, count join) runs on ≤ 640-row tables. The same shape
    scales to thousands of labels; the quadratic half-join is over
    LABEL PAIRS, never vectors.
    """
    v = _vecs(spark, sf_dir)
    ex = v.select("label", F.posexplode("v").alias("i0", "x")).select(
        "label",
        (F.col("i0") + 1).alias("i"),
        (F.col("x").cast("decimal(19,9)") * F.lit(1_000_000_000)).cast("long").alias("xq"),
    )
    sv = ex.groupBy("label", "i").agg(F.sum("xq").cast("long").alias("s"))
    d38 = "decimal(38,0)"
    nrm = sv.groupBy("label").agg(
        F.sum(F.col("s").cast(d38) * F.col("s").cast(d38)).alias("nn")
    )
    cnt = v.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = sv.select(F.col("label").alias("la"), "i", F.col("s").alias("sa"))
    b = sv.select(F.col("label").alias("lb"), "i", F.col("s").alias("sb"))
    dotp = (
        a.join(b, "i")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(F.sum(F.col("sa").cast(d38) * F.col("sb").cast(d38)).alias("dp"))
    )
    cos = F.when(
        (F.col("na") == 0) | (F.col("nb") == 0), F.lit(None).cast("double")
    ).otherwise(
        F.round(
            F.col("dp").cast("double")
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
            6,
        )
    )
    return (
        dotp.join(nrm.select(F.col("label").alias("la"), F.col("nn").alias("na")), "la")
        .join(nrm.select(F.col("label").alias("lb"), F.col("nn").alias("nb")), "lb")
        .join(cnt.select(F.col("label").alias("la"), F.col("n").alias("n_a")), "la")
        .join(cnt.select(F.col("label").alias("lb"), F.col("n").alias("n_b")), "lb")
        .select(
            F.col("la").cast("long").alias("label_a"),
            F.col("lb").cast("long").alias("label_b"),
            "n_a",
            "n_b",
            cos.alias("cosine"),
        )
    )


# SemDeDup threshold: tau = 0.45 on int8-quantized cosine, compared as
# the all-integer inequality 400*dot^2 >= 81*na*nb (tau^2 = 81/400)
# with a dot > 0 guard. int64 headroom: |dot| <= 127^2 * 64 ~ 1.03e6,
# so 400*dot^2 <= 4.3e14 and 81*na*nb <= 8.7e13 — both far below 2^63,
# and the same products stay exact in numpy int64 and DuckDB BIGINT.
# tau chosen from the measured within-cell cosine distribution (46
# pairs >= 0.45 at sf0.1, 6 at sf0.01, max 0.598): both the pruned and
# the kept branch are exercised at every correctness scale.
_SEM_CENTROID_IDS = tuple(range(20, 28))  # advanced.CENTROID_IDS (module import would cycle)


def _semdedup_prune_cell(pdf):
    """Per-cell SemDeDup kernel (grouped-map applyInPandas): one int64
    Gram matrix per cluster instead of |cell|^2 interpreted per-pair
    lambdas. Rows are sorted by vec_id so the strict lower triangle of
    the duplicate mask IS the smaller-id-neighbor relation."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    q = np.array([list(x) for x in pdf["qv"]], dtype=np.float64).astype(np.int64)
    d = q @ q.T
    nrm = np.diag(d).copy()
    dup = (d > 0) & (400 * d * d >= 81 * np.outer(nrm, nrm))
    np.fill_diagonal(dup, False)
    return pd.DataFrame(
        {
            "vec_id": pdf["vec_id"],
            "cid": pdf["cid"],
            "n_dup_neighbors": dup.sum(axis=1).astype("int64"),
            "pruned": np.tril(dup, -1).any(axis=1),
        }
    )


@query(
    "semdedup_cell_prune",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
        WHERE list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) > 0
    ),
    cents AS (SELECT vec_id - 20 AS cid, dv AS cv FROM v WHERE vec_id BETWEEN 20 AND 27),
    scored AS (
        SELECT v.vec_id, v.dv, c.cid,
               round({_COS_DUCK.format(a="v.dv", b="c.cv")}, 6) AS csim
        FROM v CROSS JOIN cents c
    ),
    assigned AS (
        SELECT vec_id, dv, cid FROM scored
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) = 1
    ),
    n AS (
        SELECT vec_id, cid, qv, CAST(list_inner_product(qv, qv) AS BIGINT) AS nrm
        FROM (SELECT vec_id, cid, {{q}} AS qv FROM assigned)
    ),
    dots AS (
        SELECT a.vec_id, a.cid, b.vec_id AS b_id,
               CAST(list_inner_product(a.qv, b.qv) AS BIGINT) AS d,
               a.nrm AS na, b.nrm AS nb
        FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id <> b.vec_id
    )
    SELECT n.vec_id, n.cid,
           CAST(COALESCE(sum(CASE WHEN d.d > 0 AND 400 * d.d * d.d >= 81 * d.na * d.nb
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_neighbors,
           COALESCE(max(CASE WHEN d.b_id < d.vec_id AND d.d > 0
                              AND 400 * d.d * d.d >= 81 * d.na * d.nb
                             THEN 1 ELSE 0 END), 0) = 1 AS pruned
    FROM n LEFT JOIN dots d ON d.vec_id = n.vec_id
    GROUP BY n.vec_id, n.cid
    """.replace("{q}", _QUANT_DUCK),
)
def semdedup_cell_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    semantic deduplication by clustering the embedding corpus, then
    pruning within-cluster pairs whose cosine exceeds tau. The
    embedding-space complement of the text-side MinHash family: it
    collapses paraphrases and re-encodings that share no shingles.
    Per vector: its cell, how many in-cell duplicate neighbors it has,
    and whether it is pruned (a smaller-vec_id neighbor above tau keeps
    the copy with the lowest id — the pairwise-admission rule;
    sequential_dedup_admission is the exact-chain precedent, and the
    paper's keep-farthest-from-centroid variant swaps only this rule).

    Exactness: assignment reuses ivf_ann_topk's fixed-centroid
    round(cos, 6) argmax (hash-checked since r8); the duplicate test is
    ALL-integer on int8 codes (quantize_int8 / _QUANT_DUCK), so the
    pandas kernel's numpy int64 Gram matrix and DuckDB's BIGINT
    list_inner_product agree bit-for-bit — no float on the comparison
    surface.

    Plan/scale: assignment is the map-side broadcast-centroid pass
    (O(k·n), no shuffle); ONE shuffle groups each cell, and the kernel
    is a cell-local int64 matmul — the published SemDeDup cost model,
    where k is sized so cells stay O(10^4-10^5) rows (k ~ n/budget at
    100 TB; a cell that outgrows the budget is exactly the recluster
    trigger ivf_centroid_drift_report flags). Arrow batches move int8
    codes, not float vectors. Within-cell pairwise work is the method's
    intrinsic cost — it is why SemDeDup clusters FIRST, never all-pairs
    (near_dup_embeddings_lsh is the banded alternative when no
    clustering exists). Reference parity: the reference (707-LoC
    pandas/BigQuery ETL) has no dedup surface; this extends SURVEY §2's
    LLM-pipeline dedup family to embedding space.
    """
    from pyspark.sql import Window

    v = _vecs(spark, sf_dir).filter(F.array_max(F.transform(F.col("v"), F.abs)) > 0)
    cents = F.broadcast(
        v.filter(F.col("vec_id").isin(*_SEM_CENTROID_IDS)).select(
            (F.col("vec_id") - 20).alias("ccid"), F.col("v").alias("cv")
        )
    )
    scored = v.crossJoin(cents).select(
        "vec_id", "v", "ccid", F.round(cosine(F.col("v"), F.col("cv")), 6).alias("csim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("ccid").asc())
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("ccid").alias("cid"), quantize_int8(F.col("v")).alias("qv"))
    )
    return assigned.groupBy("cid").applyInPandas(
        _semdedup_prune_cell,
        schema="vec_id long, cid long, n_dup_neighbors long, pruned boolean",
    )
