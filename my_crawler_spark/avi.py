"""Pure-python RIFF/AVI container with MJPEG video streams — REAL bitstreams.

Closes the round-4 "video decode env-gated" gap with no codec libs: an AVI
is RIFF chunk framing around per-frame payloads, and with the 'MJPG' FourCC
each frame IS a baseline JPEG — which this repo already decodes from
scratch in pure numpy (`my_crawler_spark/jpeg.py`). Container parsing +
that codec = real video frame sampling with real pixels.

The reference has no video code (it crawls HTML — non-text content types
are rejected in `spider/src/web_visitor.rs`); video belongs to the
beyond-reference multimodal suite, feeding
`operators/multimodal.py::sample_video_frames` / ``video_frame_stats``.

Layout written (the minimal standard MJPEG AVI):

    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
               LIST('movi' '00dc'<jpeg> ...) idx1)

fps rides in ``strh`` as the rational rate/scale (scale fixed at 1000 so
non-integer rates like 29.97 survive exactly to 3 decimals); frame count
in both ``avih.total_frames`` and ``strh.length``. The parser walks chunks
by declared size (word-aligned), tolerates missing idx1, and accepts both
'00dc' (compressed) and '00db' (uncompressed-tagged) frame chunks.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from . import jpeg


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


_SCALE = 1000  # strh time base: rate/scale = fps, 3-decimal exact


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: float, quality: int = 98
) -> bytes:
    """List of HxWx3 uint8 RGB frames (uniform shape) -> AVI/MJPEG bytes.

    Each frame is one baseline-JFIF '00dc' chunk from our own encoder, so
    the whole bitstream is decodable by any stock player AND by this repo
    alone. quality=98 keeps per-frame PSNR >= 40 dB (the lossy-format
    invariant from the graft contract)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one shape")
    payloads = [jpeg.encode_jpeg(f, quality=quality) for f in frames]
    rate = round(fps * _SCALE)
    us_per_frame = round(1_000_000 * _SCALE / rate)
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, max_bytes * max(int(fps), 1), 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        _SCALE, rate, 0, len(frames), max_bytes, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b"movi"
    index = b""
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        index += struct.pack("<4sII I", b"00dc", 0x10, len(movi_body), len(p))
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", index)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_size) for chunks in data[pos:end]."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


def avi_info(data: bytes) -> tuple[int, float, int, int]:
    """Header-only parse -> (n_frames, fps, width, height).

    Reads hdrl only (strh's rational rate/scale wins over avih's rounded
    us_per_frame) — O(header) per row, no frame decode, so duration/rate
    metadata extraction over a binary column never touches the payload.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    n_frames = w = h = None
    fps = None
    for tag, start, size in _walk(data, 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])):
        if tag != b"LIST" or data[start : start + 4] != b"hdrl":
            continue
        for t2, s2, z2 in _walk(data, start + 4, start + size):
            if t2 == b"avih":
                vals = struct.unpack_from("<IIIIIIIIII", data, s2)
                n_frames, w, h = vals[4], vals[8], vals[9]
                if vals[0]:
                    fps = 1_000_000 / vals[0]
            elif t2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                for t3, s3, z3 in _walk(data, s2 + 4, s2 + z2):
                    if t3 == b"strh" and data[s3 : s3 + 4] == b"vids":
                        _, _, _, _, _, _, scale, rate, _, length = struct.unpack_from(
                            "<4s4sIHHIIIII", data, s3
                        )
                        if scale:
                            fps = rate / scale
                        n_frames = length
        break
    if n_frames is None or fps is None:
        raise ValueError("missing AVI header")
    return int(n_frames), float(fps), int(w or 0), int(h or 0)


def iter_avi_frames(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (frame_index, jpeg_bytes) by walking the movi list in order —
    frames decode lazily, so sampling every Nth frame pays JPEG cost only
    for the sampled ones."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    idx = 0
    for tag, start, size in _walk(data, 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])):
        if tag != b"LIST" or data[start : start + 4] != b"movi":
            continue
        for t2, s2, z2 in _walk(data, start + 4, start + size):
            if t2 in (b"00dc", b"00db"):
                yield idx, data[s2 : s2 + z2]
                idx += 1
        break


def decode_avi_mjpeg(data: bytes) -> tuple[list[np.ndarray], float]:
    """AVI/MJPEG bytes -> (list of HxWx3 uint8 frames, fps)."""
    _, fps, _, _ = avi_info(data)
    return [jpeg.decode_jpeg(p) for _, p in iter_avi_frames(data)], fps
