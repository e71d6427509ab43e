"""Multimodal queries: binary media columns + mapInPandas decode paths
(multimodal/media.py) as driver-checkable queries.

The FAKE1 payload is the document's UTF-8 text bytes, and the corpus is
pure ASCII (checked: code points 32..121), so DuckDB replays the byte
math exactly via per-char code points — the oracle checks the REAL
Arrow→numpy decode output, not a simplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.multimodal import (
    attach_media,
    decode_image_stats,
    resize_nearest,
    sample_frames,
)
from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.tables import load_table

_BYTES_DUCK = "list_transform(split(text, ''), x -> unicode(x))"


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attach_media(load_table(spark, sf_dir, "documents"))


@query(
    "media_image_stats",
    oracle=f"""
    WITH b AS (SELECT doc_id, {_BYTES_DUCK} AS bytes FROM documents)
    SELECT doc_id AS asset_id,
           CAST(len(bytes) AS BIGINT) AS n_bytes,
           round(list_avg(bytes), 6) AS mean_byte,
           CAST(list_min(bytes) AS INT) AS min_byte,
           CAST(list_max(bytes) AS INT) AS max_byte
    FROM b
    """,
)
def media_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary decode + feature extraction through mapInPandas
    (multimodal/media.py decode_image_stats): Arrow batch → zero-copy
    np.frombuffer → per-asset byte stats."""
    stats = decode_image_stats(_assets(spark, sf_dir))
    return stats.select(
        "asset_id", "n_bytes", F.round("mean_byte", 6).alias("mean_byte"), "min_byte", "max_byte"
    )


@query(
    "media_frame_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, CAST(doc_id % 4 + 1 AS INT) AS nf, length(text) AS L
      FROM documents
    ),
    fr AS (
      SELECT doc_id, unnest(generate_series(0, nf - 1, 2)) AS frame_idx, L // nf AS flen, text
      FROM d WHERE L // nf > 0
    )
    SELECT doc_id AS asset_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(flen AS BIGINT) AS frame_bytes,
           round(list_avg(list_transform(split(substr(text, frame_idx * flen + 1, flen), ''), x -> unicode(x))), 6) AS frame_mean
    FROM fr
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 2nd frame of the n_frames-sliced
    payload) — the 1-row→N-rows flat-map shape of a real frame
    extractor, via mapInPandas (multimodal/media.py sample_frames)."""
    frames = sample_frames(_assets(spark, sf_dir), every_k=2)
    return frames.select(
        "asset_id", "frame_idx", "frame_bytes", F.round("frame_mean", 6).alias("frame_mean")
    )


@query(
    "media_resize_stats",
    # r13 (VERDICT task 3, closing the rows-only floor): the FAKE1
    # decode is np.resize (cyclic tile/truncate) + the floor index
    # map, so the resized mean has a CLOSED FORM over the payload
    # bytes — pixel (j, i, ch) of the 8×8×3 output reads flat source
    # index ((j*h//8)*w + (i*w//8))*3 + ch, tiled modulo len(bytes).
    # The oracle replays exactly that per-byte math in DuckDB
    # (p = j*24 + i*3 + ch enumerates the 192 output samples); the
    # division by 192 = 3·2^6 makes the mean an exact double both
    # sides. The resized payload itself (binary) stays out of the
    # checked projection; its exact pixels are pinned in
    # tests/test_multimodal.py.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_BYTES_DUCK} AS bytes, length(text) AS n,
             doc_id % 16 + 8 AS w,
             (doc_id // 16) % 16 + 8 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, n, bytes, w, h, unnest(generate_series(0, 191)) AS p
      FROM d
    )
    SELECT doc_id AS asset_id,
           CAST(8 AS INT) AS out_width,
           CAST(8 AS INT) AS out_height,
           round(CAST(sum(bytes[
             ((((p // 24) * h // 8) * w + ((p % 24) // 3) * w // 8) * 3
              + p % 3) % n + 1
           ]) AS DOUBLE) / 192, 6) AS resized_mean
    FROM px GROUP BY doc_id
    """,
)
def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize of every asset's declared raster to 8×8
    (multimodal/media.py resize_nearest); emits geometry + mean, the
    resized payload itself is dropped from the checked projection."""
    resized = resize_nearest(_assets(spark, sf_dir), out_w=8, out_h=8)
    return resized.select(
        "asset_id", "out_width", "out_height", F.round("resized_mean", 6).alias("resized_mean")
    )


@query(
    "media_phash_near_dup",
    oracle="""
    SELECT doc_id AS asset_a,
           doc_id + 10000000 AS asset_b,
           CAST(0 AS INT) AS hamming
    FROM documents
    """,
)
def media_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (dHash) near-duplicate detection over media
    assets — the IMAGE member of the dedup family (text: MinHash /
    SimHash / Jaccard; embeddings: hyperplane LSH; media: dHash
    banding): 64-bit difference hashes from mapInPandas, candidates
    via a (band, 16-bit-slice) equi-join — 4 bands, so any pair within
    Hamming distance <= 2 is guaranteed to collide in at least one
    band (pigeonhole, the SimHash block argument) — verified with a
    codegen bit_count(XOR) Hamming filter. Linear in corpus size,
    never all-pairs.

    Fixture: no two distinct FAKE1 assets are perceptually close (the
    geometry is id-derived; measured min organic Hamming 11 at sf0.01,
    6 at sf0.1 — both above the threshold of 2), so the corpus is
    DOUBLED with shifted ids first. The planted duplicates are then
    provably the complete answer, which makes the oracle a closed
    form: every (doc_id, doc_id + 10M) pair at Hamming 0 — a
    hash-checked adjudication of the whole hash→band→join→verify
    pipeline, not a vacuous empty pass.
    """
    from currency_etl_pipeline_spark.multimodal import dhash_assets

    assets = _assets(spark, sf_dir)
    doubled = assets.unionByName(
        assets.withColumn("asset_id", F.col("asset_id") + F.lit(10000000))
    )
    # Hash ONCE: both self-join sides read the checkpointed
    # (asset_id, phash) table (16 bytes/asset) — without the pin each
    # side re-runs the mapInPandas decode+hash over the binary corpus
    # (measured 4 documents scans; the CC-loop lineage-cut pattern).
    hashes = dhash_assets(doubled).localCheckpoint(eager=True)
    bands = hashes.select(
        "asset_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), 16 * k)
                        .bitwiseAND(F.lit(65535))
                        .alias("slice"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("bk"),
    ).select("asset_id", "phash", F.col("bk.band").alias("band"), F.col("bk.slice").alias("slice"))
    a = bands.select(
        F.col("asset_id").alias("asset_a"), F.col("phash").alias("ph_a"), "band", "slice"
    )
    b = bands.select(
        F.col("asset_id").alias("asset_b"), F.col("phash").alias("ph_b"), "band", "slice"
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        a.join(b, ["band", "slice"])
        .filter(F.col("asset_a") < F.col("asset_b"))
        .select("asset_a", "asset_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= 2)
        .distinct()
    )


@query(
    "media_audio_fp_near_dup",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_BYTES_DUCK} AS bytes, length(text) AS n FROM documents
    ),
    seg AS (
      SELECT doc_id, k,
             coalesce(list_sum(bytes[(k * n) // 65 + 1 : ((k + 1) * n) // 65]), 0) AS e
      FROM b CROSS JOIN generate_series(0, 64) AS g(k)
    ),
    bits AS (
      SELECT doc_id, k - 1 AS i,
             CASE WHEN e > lag(e) OVER (PARTITION BY doc_id ORDER BY k)
                  THEN 1 ELSE 0 END AS bit
      FROM seg QUALIFY k >= 1
    ),
    sl AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN i // 16 = 0 THEN bit << (15 - i % 16) ELSE 0 END) AS INT) AS s0,
             CAST(sum(CASE WHEN i // 16 = 1 THEN bit << (15 - i % 16) ELSE 0 END) AS INT) AS s1,
             CAST(sum(CASE WHEN i // 16 = 2 THEN bit << (15 - i % 16) ELSE 0 END) AS INT) AS s2,
             CAST(sum(CASE WHEN i // 16 = 3 THEN bit << (15 - i % 16) ELSE 0 END) AS INT) AS s3
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS asset_a, c.doc_id AS asset_b,
           CAST(bit_count(xor(a.s0, c.s0)) + bit_count(xor(a.s1, c.s1))
              + bit_count(xor(a.s2, c.s2)) + bit_count(xor(a.s3, c.s3)) AS INT) AS hamming
    FROM sl a JOIN sl c ON a.doc_id < c.doc_id
    WHERE bit_count(xor(a.s0, c.s0)) + bit_count(xor(a.s1, c.s1))
        + bit_count(xor(a.s2, c.s2)) + bit_count(xor(a.s3, c.s3)) <= 2
    """,
)
def media_audio_fp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate detection — the AUDIO member of the dedup
    family (text: MinHash/SimHash/Jaccard; embeddings: hyperplane LSH;
    images: dHash; audio: THIS): a 64-bit energy-envelope gradient
    fingerprint per asset (multimodal/media.audio_fingerprint_assets,
    the FFT-free Chromaprint shape), candidates via the (band, 16-bit
    slice) equi-join, Hamming ≤ 2 verified with codegen bit_count(XOR)
    over the four slices. By pigeonhole any pair within Hamming 2 of
    64 bits shares at least one of the 4 slices, so the banded join
    loses nothing — which is also why the ORACLE can brute-force all
    pairs (O(n²) is fine for DuckDB at sf0.01) while the Spark plan
    stays linear: the engine and the oracle take different routes to
    the provably-identical answer. Unlike the image twin (whose
    geometry makes organic near-dups impossible, so it plants them),
    the envelope fingerprint has ORGANIC collisions in the fixture
    corpus (33 pairs at sf0.01) — the gate is exercised both ways on
    real data with no grafting.

    Plan/scale: fingerprints are computed ONCE (localCheckpoint — both
    self-join sides read the 20-byte/asset table, not the decoded
    corpus), bands explode 4× that, the equi-join fans out by bucket
    collision only (max bucket 109 at sf0.1). Linear, never all-pairs.
    """
    from currency_etl_pipeline_spark.multimodal import audio_fingerprint_assets

    fps = audio_fingerprint_assets(_assets(spark, sf_dir)).localCheckpoint(eager=True)
    bands = fps.select(
        "asset_id",
        "s0",
        "s1",
        "s2",
        "s3",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("band"), F.col(f"s{k}").alias("slice"))
                    for k in range(4)
                ]
            )
        ).alias("bk"),
    ).select(
        "asset_id", "s0", "s1", "s2", "s3",
        F.col("bk.band").alias("band"), F.col("bk.slice").alias("slice"),
    )
    a = bands.select(
        F.col("asset_id").alias("asset_a"),
        *[F.col(f"s{k}").alias(f"a{k}") for k in range(4)],
        "band",
        "slice",
    )
    b = bands.select(
        F.col("asset_id").alias("asset_b"),
        *[F.col(f"s{k}").alias(f"b{k}") for k in range(4)],
        "band",
        "slice",
    )
    ham = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}"))) for k in range(4)
    )
    return (
        a.join(b, ["band", "slice"])
        .filter(F.col("asset_a") < F.col("asset_b"))
        .select("asset_a", "asset_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 2)
        .distinct()
    )


@query(
    "media_audio_rms",
    # r13 (VERDICT task 3): the fake1 codec reads payload bytes as
    # unsigned 8-bit samples, so every hop-strided window's exact
    # integer sum-of-squares is a DuckDB list expression over the
    # text's code points (window k covers python raw[32k : 32k+64] =
    # 1-based inclusive bytes[32k+1 : 32k+64]; tails < 64 samples are
    # dropped, so docs shorter than 64 bytes emit nothing). rms =
    # sqrt(sum_sq / 64): /64 is exact in binary and sqrt is correctly
    # rounded in both engines, so the doubles are bit-identical.
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_BYTES_DUCK} AS bytes, length(text) AS n FROM documents
    ),
    w AS (
      SELECT doc_id, bytes,
             unnest(generate_series(0, CAST((n - 64) // 32 AS INT))) AS k
      FROM b WHERE n >= 64
    ),
    s AS (
      SELECT doc_id, k,
             CAST(list_sum(list_transform(bytes[k * 32 + 1 : k * 32 + 64],
                                          v -> v * v)) AS BIGINT) AS ss
      FROM w
    )
    SELECT doc_id AS asset_id,
           CAST(k AS INT) AS window_idx,
           CAST(64 AS INT) AS n_samples,
           ss AS sum_sq,
           sqrt(CAST(ss AS DOUBLE) / 64) AS rms
    FROM s
    """,
)
def media_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio RMS over FAKE1 PCM payloads (64-sample windows,
    32 hop) — the audio member of the multimodal family (image stats /
    video frame-sample / audio framing). Hash-checked since r13 (was
    rows-only): the closed-form oracle replays the exact per-window
    integer sum-of-squares from the payload bytes; the exact sum_sq
    integers are additionally pinned against an independent
    pure-Python computation in tests/test_multimodal.py."""
    from currency_etl_pipeline_spark.multimodal.media import audio_window_rms

    return audio_window_rms(_assets(spark, sf_dir), window=64, hop=32)
