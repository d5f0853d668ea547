from __future__ import annotations

import numpy as np
import pytest

from my_crawler_spark import codecs
from my_crawler_spark.fixtures import make_pixels


def test_png_roundtrip_exact():
    px = make_pixels(42, 7, 24, 24)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(px)), px)


def test_lossy_psnr_over_40db():
    # jpeg is the real baseline codec (q98); webp is the real VP8L
    # lossless codec — both must hold the input_hint's >=40 dB invariant
    # (VP8L trivially: decode == source exactly, PSNR = inf)
    for fmt in ("jpeg", "webp"):
        for i in range(5):
            px = make_pixels(42, i, 24, 24)
            dec = codecs.decode_image(codecs.encode_image(px, fmt))
            assert codecs.psnr(px, dec) >= 40.0, (fmt, i)
            if fmt == "webp":
                assert np.array_equal(dec, px)


def test_phash_stable_and_robust():
    px = make_pixels(42, 3, 24, 24)
    h1 = codecs.phash64(px)
    assert h1 == codecs.phash64(px.copy())
    # small noise keeps hamming distance low
    noisy = np.clip(px.astype(int) + 2, 0, 255).astype(np.uint8)
    assert codecs.hamming64(h1, codecs.phash64(noisy)) <= 10
    # a different image differs a lot
    other = make_pixels(42, 99, 24, 24)
    assert codecs.hamming64(h1, codecs.phash64(other)) > 10


def test_decode_unknown_raises():
    # lossy-VP8 webp -> env-gated NotImplemented (VP8L lossless is real)
    with pytest.raises(NotImplementedError):
        codecs.decode_image(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd")
    # unknown container magic -> env-gated NotImplemented
    with pytest.raises(NotImplementedError):
        codecs.decode_image(b"NOTACODEC0")
    # truncated jpeg -> structural decode error, not the env gate
    with pytest.raises(ValueError):
        codecs.decode_image(b"\xff\xd8\xff\xdb\x00\x04\x00\x00")
