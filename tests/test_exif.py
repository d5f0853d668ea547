"""EXIF codec (exif.py) + the Spark metadata/scrub operators."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from my_crawler_spark import codecs as C
from my_crawler_spark import exif as X
from my_crawler_spark.fixtures import make_pixels


def _tagged(k: int = 3, gps=(37.7749, -122.4194)) -> tuple[bytes, bytes]:
    base = C.encode_image(make_pixels(7, k, 16, 16), "jpeg")
    app1 = X.build_exif_app1(
        orientation=6,
        datetime="2021:05:04 10:20:30",
        make="Acme",
        model="Cam-9",
        gps=gps,
    )
    return base, X.insert_app1(base, app1)


def test_build_parse_roundtrip():
    _, tagged = _tagged()
    m = X.parse_exif(tagged)
    assert m["orientation"] == 6
    assert m["datetime"] == "2021:05:04 10:20:30"
    assert m["make"] == "Acme" and m["model"] == "Cam-9"
    assert m["has_gps"]
    assert m["gps_lat"] == pytest.approx(37.7749, abs=1e-4)
    assert m["gps_lon"] == pytest.approx(-122.4194, abs=1e-4)


def test_exact_quarter_degree_coordinates_survive_rational_roundtrip():
    # x.25 deg = exactly 15 minutes: the deg/min/sec encoding is lossless
    _, tagged = _tagged(gps=(-84.75, 17.5))
    m = X.parse_exif(tagged)
    assert m["gps_lat"] == -84.75
    assert m["gps_lon"] == 17.5


def test_strip_gps_keeps_other_tags_and_pixels():
    base, tagged = _tagged()
    scrubbed = X.strip_gps(tagged)
    m = X.parse_exif(scrubbed)
    assert not m["has_gps"] and m["gps_lat"] is None and m["gps_lon"] is None
    assert m["orientation"] == 6
    assert m["datetime"] == "2021:05:04 10:20:30"
    assert m["make"] == "Acme" and m["model"] == "Cam-9"
    # the entropy-coded scan is untouched: decoded pixels byte-identical
    assert np.array_equal(C.decode_image(scrubbed), C.decode_image(base))
    # idempotent; and a GPS-less JPEG round-trips unchanged
    assert X.strip_gps(scrubbed) == scrubbed
    assert X.strip_gps(base) == base
    nogps = X.insert_app1(base, X.build_exif_app1(orientation=3))
    assert X.strip_gps(nogps) == nogps


def test_parse_no_exif_and_non_jpeg():
    base, _ = _tagged()
    m = X.parse_exif(base)
    assert m == {
        "orientation": None,
        "datetime": None,
        "make": None,
        "model": None,
        "has_gps": False,
        "gps_lat": None,
        "gps_lon": None,
    }
    png = C.encode_image(make_pixels(7, 1, 8, 8), "png")
    assert X.parse_exif(png)["orientation"] is None
    assert X.strip_gps(png) == png
    assert X.parse_exif(b"") == m
    assert X.parse_exif(b"\xff\xd8\xff") == m  # truncated segment chain


def test_little_endian_tiff_parses():
    base, _ = _tagged()
    entry = struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<H", 8) + b"\x00\x00"
    tiff = (
        b"II"
        + struct.pack("<H", 42)
        + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + entry
        + struct.pack("<I", 0)
    )
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert X.parse_exif(X.insert_app1(base, app1))["orientation"] == 8


def test_southern_western_hemisphere_signs():
    _, tagged = _tagged(gps=(-33.75, -70.25))
    m = X.parse_exif(tagged)
    assert m["gps_lat"] == -33.75 and m["gps_lon"] == -70.25


def test_spark_exif_stats_and_scrub(spark):
    rows = []
    for k in range(6):
        base = C.encode_image(make_pixels(7, k, 16, 16), "jpeg")
        if k < 4:
            base = X.insert_app1(
                base,
                X.build_exif_app1(
                    orientation=k + 1,
                    make="M%d" % k,
                    gps=(10.25 + k, -20.5) if k % 2 == 0 else None,
                ),
            )
        rows.append(("i-%d" % k, base))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    from my_crawler_spark.operators.multimodal import exif_stats, scrub_exif_gps

    stats = {r["image_id"]: r for r in exif_stats(df).collect()}
    assert stats["i-0"]["has_gps"] and stats["i-0"]["gps_lat"] == 10.25
    assert stats["i-1"]["orientation"] == 2 and not stats["i-1"]["has_gps"]
    assert stats["i-4"]["orientation"] is None  # no EXIF
    scrubbed = scrub_exif_gps(df)
    out = {r["image_id"]: r for r in scrubbed.collect()}
    assert out["i-0"]["had_gps"] and out["i-2"]["had_gps"]
    assert not out["i-1"]["had_gps"] and not out["i-5"]["had_gps"]
    re_stats = {
        r["image_id"]: r
        for r in exif_stats(
            scrubbed.select("image_id", "bytes")
        ).collect()
    }
    for iid, r in re_stats.items():
        assert not r["has_gps"], iid
    assert re_stats["i-0"]["make"] == "M0"
    assert re_stats["i-0"]["orientation"] == 1
