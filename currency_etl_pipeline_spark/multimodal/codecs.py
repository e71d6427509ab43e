"""Real media codecs on the standard library: PNG (zlib) and WAV (wave).

VERDICT r7 task 6 asked for a real-codec decode probe; this container
ships neither Pillow nor soundfile, but genuine PNG and WAV byte
streams don't need them — PNG is zlib-compressed filtered scanlines
(RFC 2083) and WAV is RIFF-framed PCM, both fully decodable with the
stdlib. So instead of a probe that stays dead in this environment, the
engine carries REAL codecs:

- :func:`decode_png` / :func:`encode_png` — 8-bit AND 16-bit (r9)
  grayscale / RGB / RGBA, non-interlaced AND Adam7-interlaced (r9),
  all five scanline filters (None, Sub, Up, Average, Paeth) on decode,
  filter-0 on encode. Output of any standard encoder at these
  geometry/bit-depth settings decodes here; bytes produced here open
  in any image viewer.
- :func:`decode_wav` / :func:`encode_wav` — 8-bit unsigned / 16-bit
  signed PCM via the stdlib ``wave`` module.

Pillow remains an optional upgrade for the formats this module does
not cover (JPEG — a DCT entropy codec is genuinely out of stdlib
scope; palette/1-2-4-bit PNG): ``media.decode_image_stats`` probes it
at import and routes its named formats there when present
(probe-and-document, the protobuf discipline).

Scale note: these run INSIDE mapInPandas batches (multimodal/media.py)
— per-row Python cost on the executor, the same budget a Pillow call
would spend; nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (depths 8 and 16)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}

# Adam7 pass grids: (y_start, y_step, x_start, x_step) per RFC 2083
_ADAM7 = [
    (0, 8, 0, 8),
    (0, 8, 4, 8),
    (4, 8, 0, 4),
    (0, 4, 2, 4),
    (2, 4, 0, 2),
    (0, 2, 1, 2),
    (1, 2, 0, 1),
]


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W) or (H, W, {1,3,4}) array → PNG bytes (filter 0 on every
    scanline). dtype uint8 → 8-bit depth, uint16 → 16-bit (big-endian
    samples, per spec). ``interlace=True`` writes Adam7: the seven
    passes' sub-images are filtered independently, exactly the stream
    shape :func:`decode_png` deinterlaces."""
    arr = np.asarray(img)
    if arr.dtype == np.uint16:
        depth = 16
    else:
        arr = arr.astype(np.uint8)
        depth = 8
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0)

    def lines(sub: np.ndarray) -> bytes:
        if depth == 16:
            payload = sub.astype(">u2")
        else:
            payload = sub
        return b"".join(b"\x00" + payload[y].tobytes() for y in range(sub.shape[0]))

    if not interlace:
        raw = lines(arr)
    else:
        raw = b""
        for y0, ystep, x0, xstep in _ADAM7:
            sub = arr[y0::ystep, x0::xstep]
            if sub.shape[0] and sub.shape[1]:
                raw += lines(sub)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, off: int, h: int, stride: int, bpp: int) -> tuple[np.ndarray, int]:
    """Reverse PNG scanline filters for one (sub-)image of ``h`` rows of
    ``stride`` bytes each, starting at byte ``off`` in ``raw``. ``bpp``
    is the filter's byte distance to "the pixel to the left" (bytes per
    pixel — filters operate on BYTES at any depth, RFC 2083 §6).
    Returns the (h, stride) byte array and the new offset."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        off += 1 + stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.uint16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out, off


def _to_samples(rows: np.ndarray, h: int, w: int, c: int, depth: int) -> np.ndarray:
    if depth == 16:
        return (
            np.frombuffer(rows.tobytes(), dtype=">u2")
            .reshape(h, w, c)
            .astype(np.uint16)
        )
    return rows.reshape(h, w, c)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) array (uint8 for 8-bit depth, uint16 for
    16-bit). Color types 0/2/6, non-interlaced or Adam7; all five
    scanline filters reversed. Palette / sub-byte depths route through
    Pillow (the documented swap point)."""
    if bytes(data[:8]) != _PNG_SIG:
        raise ValueError("not a PNG byte stream (bad signature)")
    pos, ihdr, idat = 8, None, []
    data = bytes(data)
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth not in (8, 16) or color_type not in _PNG_CHANNELS or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}); this codec does 8/16-bit 0/2/6 "
            "none/Adam7 — route through Pillow for palette/sub-byte depths"
        )
    c = _PNG_CHANNELS[color_type]
    sbytes = depth // 8
    bpp = c * sbytes
    raw = zlib.decompress(b"".join(idat))

    if interlace == 0:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG IDAT length does not match geometry")
        rows, _ = _unfilter(raw, 0, h, stride, bpp)
        return _to_samples(rows, h, w, c, depth)

    # Adam7: seven independently-filtered sub-images, scattered back
    # onto the full grid.
    if depth == 16:
        out = np.zeros((h, w, c), dtype=np.uint16)
    else:
        out = np.zeros((h, w, c), dtype=np.uint8)
    off = 0
    for y0, ystep, x0, xstep in _ADAM7:
        sub_h = len(range(y0, h, ystep))
        sub_w = len(range(x0, w, xstep))
        if sub_h == 0 or sub_w == 0:
            continue
        stride = sub_w * bpp
        rows, off = _unfilter(raw, off, sub_h, stride, bpp)
        out[y0::ystep, x0::xstep] = _to_samples(rows, sub_h, sub_w, c, depth)
    if off != len(raw):
        raise ValueError("PNG Adam7 stream length does not match geometry")
    return out


def encode_wav(samples: np.ndarray, framerate: int = 8000, sampwidth: int = 1) -> bytes:
    """1-D sample array → WAV bytes. sampwidth 1 = uint8, 2 = int16."""
    import io
    import wave

    arr = np.asarray(samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sampwidth)
        wf.setframerate(framerate)
        dtype = np.uint8 if sampwidth == 1 else "<i2"
        wf.writeframes(arr.astype(dtype).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono int64 sample array, framerate). Multi-channel
    input is averaged to mono (floor division — deterministic)."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(data)), "rb") as wf:
        n, ch, width = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        raw = wf.readframes(n)
        rate = wf.getframerate()
    if width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    elif width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    else:
        raise ValueError(f"unsupported WAV sample width {width} (1 or 2 bytes)")
    if ch > 1:
        arr = arr.reshape(-1, ch).sum(axis=1) // ch
    return arr, rate
