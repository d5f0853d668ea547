from __future__ import annotations

import numpy as np
import pandas as pd

from my_crawler_spark import codecs
from my_crawler_spark.fixtures import make_all, make_images, make_pixels


def test_deterministic():
    a = make_images(seed=42, n=10)
    b = make_images(seed=42, n=10)
    assert (a.phash == b.phash).all()
    assert (a.caption == b.caption).all()
    assert all(x == y for x, y in zip(a.bytes, b.bytes))


def test_image_invariants(fixtures):
    imgs = fixtures["images"].head(30)
    for _, r in imgs.iterrows():
        px = codecs.decode_image(r.bytes)
        assert px.shape == (r.h, r.w, 3)
        truth = make_pixels(42, int(r.image_id.split("-")[1]), r.w, r.h)
        if r.fmt == "png":
            assert np.array_equal(px, truth)
        else:
            assert codecs.psnr(px, truth) >= 40.0
        # ground truth is the decoded-pixel phash (FIXTURES.md §1)
        assert codecs.phash64(px) == r.phash


def test_web_shape(fixtures):
    pages = fixtures["pages"]
    assert pages.url.is_unique
    assert (pages.status == 403).any()
    assert pages.status.between(300, 399).any()
    assert (pages.content_type != "text/html").any()
    assert (pages.body_len > 5 * 1024 * 1024).any()
    assert (pages.flaky_fail_times > 0).any()
    # Zipf skew: hottest host has the most pages
    counts = pages.groupby("host").size().sort_values(ascending=False)
    assert counts.iloc[0] >= 3 * counts.iloc[-1]
    # chain longer than the 10-hop cap exists
    red = fixtures["redirects"]
    assert len(red) > 0
    assert red.src_url.str.contains("/chain/").sum() >= 12
