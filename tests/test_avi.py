"""AVI/MJPEG container (my_crawler_spark/avi.py) — real video bitstreams
over the from-scratch JPEG codec: roundtrip fidelity (PSNR >= 40 dB at the
quality-98 operating point, the graft contract's lossy invariant),
header-only metadata, lazy frame iteration, and malformed-input guards."""

from __future__ import annotations

import numpy as np
import pytest

from my_crawler_spark import avi
from my_crawler_spark.codecs import psnr
from my_crawler_spark.fixtures import make_pixels


def _frames(n, w=24, h=16, seed=11):
    return [make_pixels(seed, i, w, h) for i in range(n)]


def test_roundtrip_psnr_over_40db():
    frames = _frames(6)
    data = avi.encode_avi_mjpeg(frames, fps=12.0, quality=98)
    back, fps = avi.decode_avi_mjpeg(data)
    assert fps == 12.0
    assert len(back) == 6
    for src, dec in zip(frames, back):
        assert dec.shape == src.shape
        assert psnr(src, dec) >= 40.0


def test_header_only_info():
    frames = _frames(9, w=40, h=32)
    data = avi.encode_avi_mjpeg(frames, fps=29.97)
    n, fps, w, h = avi.avi_info(data)
    assert (n, w, h) == (9, 40, 32)
    assert abs(fps - 29.97) < 1e-9  # scale=1000 keeps 3 decimals exact
    # header parse must not touch the movi payload
    n2, fps2, _, _ = avi.avi_info(data[:512])
    assert (n2, fps2) == (n, fps)


def test_iter_frames_lazy_and_ordered():
    frames = _frames(5)
    data = avi.encode_avi_mjpeg(frames, fps=4.0)
    seen = []
    for idx, payload in avi.iter_avi_frames(data):
        assert payload[:2] == b"\xff\xd8"  # each chunk is a real JPEG
        seen.append(idx)
        if idx == 2:
            break  # lazy: no need to walk the tail
    assert seen == [0, 1, 2]


def test_every_frame_is_stock_decodable_jpeg():
    """Each 00dc chunk must be a self-contained baseline JFIF — decodable
    WITHOUT container context (what a stock player requires of MJPEG)."""
    from my_crawler_spark import jpeg

    frames = _frames(3)
    data = avi.encode_avi_mjpeg(frames, fps=1.0)
    payloads = [p for _, p in avi.iter_avi_frames(data)]
    assert len(payloads) == 3
    for src, p in zip(frames, payloads):
        assert psnr(src, jpeg.decode_jpeg(p)) >= 40.0


def test_rejects_mixed_shapes_and_empty():
    with pytest.raises(ValueError):
        avi.encode_avi_mjpeg([], fps=1.0)
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.zeros((8, 16, 3), np.uint8)
    with pytest.raises(ValueError):
        avi.encode_avi_mjpeg([a, b], fps=1.0)


def test_rejects_non_avi():
    with pytest.raises(ValueError):
        avi.avi_info(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        avi.decode_avi_mjpeg(b"garbage")
