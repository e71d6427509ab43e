"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The reference has no media path at all (its only payloads are currency
CSV rows), but a 100 TB training-data pipeline needs one; this module
supplies the Spark-side plumbing — schema, partitioning, UDF signature,
batch shape — with two codec tiers:

- **FAKE1 codec (default, fully implemented)**: the payload is the
  document's UTF-8 text bytes; ``meta`` declares a raster geometry
  (width × height × channels) and a frame count derived from the id.
  Decode / resize / frame-sample are REAL numpy operations on those
  bytes, so every stage is deterministic and oracle-checkable.
- **Real codecs (r8)**: genuine PNG and WAV byte streams decode via
  the stdlib codecs in ``multimodal/codecs.py`` (``codec="png"`` /
  ``codec="wav"``) — no Pillow needed for 8-bit PNG or PCM WAV. Other
  formats (JPEG, 16-bit PNG) route through Pillow when importable and
  raise a documented ``NotImplementedError`` otherwise. The
  mapInPandas scaffolding is identical across all codecs — only the
  per-payload decode callable changes.

Scale notes: payloads never hit the driver; every operator is
``mapInPandas`` over whatever partitioning the upstream scan produced
(media-heavy tables should set small ``spark.sql.files.maxPartitionBytes``
so one Arrow batch of blobs fits comfortably in executor memory).
Outputs are narrow (stats / sampled frames), so the wide binary column
is pruned immediately after the map stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real image codec — not in this container; FAKE1 is the tested path
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)


def attach_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """documents → media asset table (FAKE1 codec), entirely JVM-side.

    ``media`` is the UTF-8 encoding of the text (a genuine opaque
    binary column as far as every downstream operator is concerned);
    geometry and frame count are deterministic functions of the id so
    any engine can replay them.
    """
    did = F.col(id_col)
    return docs.select(
        did.alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.when(did % 3 == 0, "video/fake1").otherwise("image/fake1").alias("media_type"),
        F.struct(
            (did % 16 + 8).cast("int").alias("width"),
            ((did / 16).cast("long") % 16 + 8).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            (did % 4 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
    ]
)


def decode_image_stats(assets: DataFrame, codec: str = "fake1") -> DataFrame:
    """Decode + per-asset feature extraction (mapInPandas).

    Codecs (r8 — the decode step is no longer a stub):
    - ``fake1``: byte-level stats over the raw payload; the decode is
      ``np.frombuffer``, zero-copy out of the Arrow batch. The
      deterministic oracle path.
    - ``png``: REAL PNG decode (multimodal/codecs.py — stdlib zlib,
      8/16-bit gray/RGB/RGBA, non-interlaced or Adam7, all scanline
      filters); stats over the decoded PIXEL SAMPLES (n_bytes =
      decoded sample count).
    - a NAMED Pillow format (``jpeg``, ``bmp``, ``gif``, ``webp``,
      ``tiff``): Pillow when importable, else a loud
      NotImplementedError naming the swap point (probe-and-document).
    - anything else: ValueError regardless of what's installed — a
      typo like ``codec='png8'`` must not silently change semantics
      to Pillow sniffing on machines that have it and only explode on
      machines that don't (r9 ADVICE).
    """
    _PIL_FORMATS = {"jpeg", "jpg", "bmp", "gif", "webp", "tiff"}
    if codec not in {"fake1", "png"} | _PIL_FORMATS:
        raise ValueError(
            f"unknown codec {codec!r}; supported: 'fake1', 'png', "
            f"or a Pillow format {sorted(_PIL_FORMATS)}"
        )
    if codec == "png":
        from currency_etl_pipeline_spark.multimodal.codecs import decode_png

        def _decode(m):
            return decode_png(m).ravel()

    elif codec == "fake1":

        def _decode(m):
            return np.frombuffer(m, dtype=np.uint8)

    elif HAVE_PIL:
        import io

        from PIL import Image

        def _decode(m):
            return np.asarray(Image.open(io.BytesIO(m))).ravel()

    else:
        raise NotImplementedError(
            f"codec {codec!r} needs Pillow, absent in this environment; "
            "use codec='fake1' (deterministic stub) or 'png' (stdlib "
            "decoder, multimodal/codecs.py), or install Pillow"
        )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [_decode(m) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [len(a) for a in arrs],
                    "mean_byte": [float(a.mean()) if len(a) else 0.0 for a in arrs],
                    "min_byte": [int(a.min()) if len(a) else 0 for a in arrs],
                    "max_byte": [int(a.max()) if len(a) else 0 for a in arrs],
                }
            )

    return assets.select("asset_id", "media").mapInPandas(_decode_batch, IMAGE_STATS_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized_mean", T.DoubleType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_nearest(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of the FAKE1 raster (mapInPandas).

    The payload is tiled/truncated to width×height×channels (the
    declared geometry), resized on the (H, W) grid with the standard
    ``floor(y_out * H / out_h)`` index map, channels preserved.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("asset_id", "out_width", "out_height", "resized_mean", "resized")}
            for aid, m, meta in zip(pdf["asset_id"], pdf["media"], pdf["meta"]):
                w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"])
                raw = np.frombuffer(m, dtype=np.uint8)
                img = np.resize(raw, (h, w, c))  # tile/truncate to declared geometry
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                small = img[np.ix_(ys, xs)]
                out["asset_id"].append(aid)
                out["out_width"].append(out_w)
                out["out_height"].append(out_h)
                out["resized_mean"].append(float(small.mean()))
                out["resized"].append(small.tobytes())
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media", "meta").mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def sample_frames(assets: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for FAKE1 "video": the payload splits into
    ``n_frames`` equal-length frames (tail remainder dropped, as a real
    container would pad); emit every k-th frame's index + stats.
    One input row → ≤ n_frames output rows (mapInPandas is the
    flat-map shape a real frame extractor needs).
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("asset_id", "frame_idx", "frame_bytes", "frame_mean")}
            for aid, m, meta in zip(pdf["asset_id"], pdf["media"], pdf["meta"]):
                nf = int(meta["n_frames"])
                raw = np.frombuffer(m, dtype=np.uint8)
                flen = len(raw) // nf
                if flen == 0:
                    continue
                for i in range(0, nf, every_k):
                    fr = raw[i * flen : (i + 1) * flen]
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(flen)
                    out["frame_mean"].append(float(fr.mean()))
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media", "meta").mapInPandas(_sample, FRAME_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def dhash_assets(assets: DataFrame) -> DataFrame:
    """64-bit difference-hash (dHash) per asset — the perceptual
    fingerprint used for image near-duplicate detection: decode to the
    declared raster, average channels to grayscale, sample an 8×9
    grid, emit the 64 horizontal-gradient sign bits as one long.

    FAKE1 decode is np.frombuffer + np.resize (deterministic); a real
    deployment swaps in Pillow's `Image.open(...).convert('L')` with
    the identical downstream math. Output is (asset_id, phash) — 16
    bytes per asset — so the wide binary column dies at this map stage
    and everything downstream (banding, joins) is JVM-side codegen.
    """

    def _dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"asset_id": [], "phash": []}
            for aid, m, meta in zip(pdf["asset_id"], pdf["media"], pdf["meta"]):
                w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"])
                raw = np.frombuffer(m, dtype=np.uint8)
                img = np.resize(raw, (h, w, c)).mean(axis=2)
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                g = img[np.ix_(ys, xs)]
                bits = (g[:, 1:] > g[:, :-1]).flatten()
                # two's-complement int64 via packbits (MSB-first per byte)
                v = int(np.packbits(bits).view(">i8")[0])
                out["asset_id"].append(aid)
                out["phash"].append(v)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media", "meta").mapInPandas(_dhash, PHASH_SCHEMA)


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("s0", T.IntegerType()),
        T.StructField("s1", T.IntegerType()),
        T.StructField("s2", T.IntegerType()),
        T.StructField("s3", T.IntegerType()),
    ]
)


def audio_fingerprint_assets(assets: DataFrame, codec: str = "fake1") -> DataFrame:
    """64-bit audio envelope fingerprint per asset, emitted as four
    16-bit slices (s0..s3, MSB-first) — the AUDIO twin of dHash: the
    payload's samples are cut into 65 equal-share segments
    (boundaries (k·n)//65, the dHash grid rule), each segment's exact
    integer energy sum is taken, and the 64 fingerprint bits are the
    energy-gradient signs seg[k+1] > seg[k] — delta-coding the
    loudness envelope, the FFT-free core of Chromaprint-style audio
    fingerprints (gradients survive level shifts that absolute
    energies don't). Slices instead of one packed long: bit 0 would be
    the int64 sign bit, and the downstream banded join wants the 16-bit
    slices anyway.

    ``codec="fake1"`` reads unsigned 8-bit samples (the deterministic
    oracle path — DuckDB replays the exact integer math from code
    points); ``codec="wav"`` decodes real RIFF/WAVE PCM
    (multimodal/codecs.decode_wav) through the identical envelope
    math. Output is 4 ints + id per asset — the wide binary column
    dies at this map stage, everything downstream is JVM codegen.
    """
    if codec == "wav":
        from currency_etl_pipeline_spark.multimodal.codecs import decode_wav

        def _samples(m):
            return decode_wav(m)[0].astype(np.int64)

    elif codec == "fake1":

        def _samples(m):
            return np.frombuffer(m, dtype=np.uint8).astype(np.int64)

    else:
        raise NotImplementedError(
            f"codec {codec!r}: use 'fake1' (raw bytes) or 'wav' (stdlib "
            "RIFF/WAVE PCM decoder, multimodal/codecs.py)"
        )

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("asset_id", "s0", "s1", "s2", "s3")}
            for aid, m in zip(pdf["asset_id"], pdf["media"]):
                raw = _samples(m)
                n = len(raw)
                bounds = [(k * n) // 65 for k in range(66)]
                segs = [int(raw[bounds[k] : bounds[k + 1]].sum()) for k in range(65)]
                bits = [1 if segs[k + 1] > segs[k] else 0 for k in range(64)]
                out["asset_id"].append(aid)
                for b in range(4):
                    out[f"s{b}"].append(
                        sum(bit << (15 - i) for i, bit in enumerate(bits[16 * b : 16 * b + 16]))
                    )
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media").mapInPandas(_fp, AUDIO_FP_SCHEMA)


AUDIO_RMS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_window_rms(
    assets: DataFrame, window: int = 256, hop: int = 128, codec: str = "fake1"
) -> DataFrame:
    """Audio feature extraction: payload → samples, framed into
    overlapping windows (``window`` samples every ``hop``), each window
    emitting its exact integer sum-of-squares plus the derived RMS —
    the flat-map shape of a real mel/spectrogram front-end (one asset →
    many windows). ``codec="fake1"`` reads the payload bytes as
    unsigned 8-bit samples (the deterministic oracle path);
    ``codec="wav"`` decodes REAL RIFF/WAVE PCM via the stdlib wave
    module (multimodal/codecs.decode_wav — r8, the decode step is no
    longer a stub). Tail windows shorter than ``window`` are dropped,
    as a hop-based STFT would.

    Scale notes: identical to the other media ops — Arrow-batched
    mapInPandas over the scan's partitioning, payload pruned right
    after the map stage, per-window output is 5 narrow columns. The
    exact ``sum_sq`` integers make the operator pin-testable without
    floating-point tolerance.
    """

    if codec == "wav":
        from currency_etl_pipeline_spark.multimodal.codecs import decode_wav

        def _samples(m):
            return decode_wav(m)[0]

    elif codec == "fake1":

        def _samples(m):
            return np.frombuffer(m, dtype=np.uint8).astype(np.int64)

    else:
        raise NotImplementedError(
            f"codec {codec!r}: use 'fake1' (raw bytes) or 'wav' (stdlib "
            "RIFF/WAVE PCM decoder, multimodal/codecs.py)"
        )

    def _rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in ("asset_id", "window_idx", "n_samples", "sum_sq", "rms")
            }
            for aid, m in zip(pdf["asset_id"], pdf["media"]):
                raw = _samples(m)
                idx = 0
                for start in range(0, len(raw) - window + 1, hop):
                    w = raw[start : start + window]
                    ss = int((w * w).sum())
                    out["asset_id"].append(aid)
                    out["window_idx"].append(idx)
                    out["n_samples"].append(window)
                    out["sum_sq"].append(ss)
                    out["rms"].append(float(np.sqrt(ss / window)))
                    idx += 1
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media").mapInPandas(_rms, AUDIO_RMS_SCHEMA)
