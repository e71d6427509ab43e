"""Multimodal plumbing: binary payload schema, mapInPandas decode,
resize vs a numpy reference, frame-sample flat-map shape, codec stub."""

from __future__ import annotations

import numpy as np
import pytest

from currency_etl_pipeline_spark.multimodal import (
    attach_media,
    decode_image_stats,
    resize_nearest,
    sample_frames,
)
from currency_etl_pipeline_spark.multimodal.media import HAVE_PIL

TEXTS = [
    (0, "abcdefghijklmnopqrstuvwxyz0123456789 THE QUICK BROWN FOX " * 20),
    (5, "x" * 7),  # shorter than one 8x8x3 raster → np.resize tiles
    (17, "mixed Content with   spaces\tand-tabs " * 40),
]


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.createDataFrame([{"doc_id": i, "text": t} for i, t in TEXTS])
    return attach_media(docs).cache()


def test_media_schema_and_payload(assets):
    rows = {r["asset_id"]: r for r in assets.collect()}
    assert dict(assets.dtypes)["media"] == "binary"
    assert bytes(rows[0]["media"]) == TEXTS[0][1].encode()
    assert rows[0]["media_type"] == "video/fake1"  # 0 % 3 == 0
    assert rows[5]["media_type"] == "image/fake1"
    m = rows[17]["meta"]
    assert (m["width"], m["height"], m["channels"], m["n_frames"]) == (17 % 16 + 8, (17 // 16) % 16 + 8, 3, 17 % 4 + 1)


def test_decode_stats_matches_numpy(assets):
    got = {r["asset_id"]: r for r in decode_image_stats(assets).collect()}
    for i, t in TEXTS:
        a = np.frombuffer(t.encode(), dtype=np.uint8)
        assert got[i]["n_bytes"] == len(a)
        assert got[i]["mean_byte"] == pytest.approx(a.mean())
        assert (got[i]["min_byte"], got[i]["max_byte"]) == (a.min(), a.max())


def test_resize_exact_numpy_reference(assets):
    got = {r["asset_id"]: r for r in resize_nearest(assets, 4, 6).collect()}
    for i, t in TEXTS:
        w, h, c = i % 16 + 8, (i // 16) % 16 + 8, 3
        img = np.resize(np.frombuffer(t.encode(), np.uint8), (h, w, c))
        ref = img[np.ix_((np.arange(6) * h) // 6, (np.arange(4) * w) // 4)]
        assert bytes(got[i]["resized"]) == ref.tobytes()
        assert got[i]["resized_mean"] == pytest.approx(ref.mean())
        assert (got[i]["out_width"], got[i]["out_height"]) == (4, 6)


def test_frame_sample_flatmap_shape(assets):
    rows = sample_frames(assets, every_k=2).collect()
    by_asset: dict[int, list] = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # doc 0: n_frames=1 → frame 0 only; doc 5: n_frames=2, len 7 → flen 3, frames {0}
    # doc 17: n_frames=2 → frame 0 (every 2nd of [0,1])
    assert sorted(r["frame_idx"] for r in by_asset[0]) == [0]
    assert sorted(r["frame_idx"] for r in by_asset[5]) == [0]
    f5 = by_asset[5][0]
    a = np.frombuffer(b"x" * 7, np.uint8)
    assert f5["frame_bytes"] == 3 and f5["frame_mean"] == pytest.approx(a[:3].mean())


def test_real_codec_is_stubbed(assets):
    if HAVE_PIL:
        pytest.skip("Pillow present; stub path not reachable")
    with pytest.raises(NotImplementedError, match="fake1"):
        decode_image_stats(assets, codec="jpeg")


def test_audio_window_rms_exact_reference(assets):
    """Per-window sum-of-squares must equal an independent pure-Python
    computation (no numpy) — exact integers, no float tolerance; and
    the windowing must follow the hop/tail-drop contract."""
    import math

    from currency_etl_pipeline_spark.multimodal.media import audio_window_rms

    window, hop = 16, 8
    rows = audio_window_rms(assets, window=window, hop=hop).collect()
    by_asset: dict[int, dict[int, object]] = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], {})[r["window_idx"]] = r
    for i, t in TEXTS:
        raw = list(t.encode())
        expect = []
        for start in range(0, len(raw) - window + 1, hop):
            expect.append(sum(b * b for b in raw[start : start + window]))
        got = by_asset.get(i, {})
        assert sorted(got) == list(range(len(expect))), f"asset {i} window indices"
        for idx, ss in enumerate(expect):
            r = got[idx]
            assert r["sum_sq"] == ss
            assert r["n_samples"] == window
            assert r["rms"] == pytest.approx(math.sqrt(ss / window))
