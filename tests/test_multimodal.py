from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from my_crawler_spark import codecs
from my_crawler_spark.fixtures import make_pixels
from my_crawler_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def images(spark):
    rows = []
    for i in range(12):
        fmt = ["png", "jpeg", "webp"][i % 3]
        px = make_pixels(3, i, 20, 20)
        rows.append((f"i{i}", codecs.encode_image(px, fmt)))
    rows.append(("bad", b"garbage-not-an-image"))
    return spark.createDataFrame(rows, "image_id string, bytes binary")


def test_decode_stats(spark, images):
    got = {r.image_id: r for r in MM.decode_stats(images).collect()}
    assert got["bad"].decode_ok is False
    oks = [r for k, r in got.items() if k != "bad"]
    assert all(r.decode_ok and r.w == 20 and r.h == 20 for r in oks)
    assert all(0 <= r.mean_luma <= 255 for r in oks)


def test_resize_roundtrip(spark, images):
    out = MM.resize_images(images.filter("image_id = 'i0'"), 10, 10).collect()[0]
    px = codecs.decode_png(bytes(out.bytes))
    assert px.shape == (10, 10, 3)


def test_image_features_normalized(spark, images):
    feats = MM.image_features(images.filter("image_id != 'bad'"), bins=8).collect()
    for r in feats:
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-5


def test_video_frame_sampling(spark):
    media = spark.createDataFrame(
        [("v1", MM.fake_media_payload("video", 3.0, 10, 1)),
         ("a1", MM.fake_media_payload("audio", 3.0, 100, 2))],
        "media_id string, bytes binary",
    )
    got = MM.sample_video_frames(media, target_fps=2.0).collect()
    ids = {r.media_id for r in got}
    assert ids == {"v1"}  # audio rows skipped
    # 3s at 10 fps sampled at 2 fps -> every 5th frame -> 6 frames
    assert len(got) == 6


def test_real_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        MM._parse_fake_media(b"\x00\x00\x01\xba real mpeg would go here")


@pytest.fixture(scope="module")
def twin_images(spark):
    """Base images + noise-perturbed twins for every 3rd base (planted
    near-dups) — twins measure hamming 0-4 on this distribution,
    unrelated images 26-34."""
    import numpy as np

    rows = []
    for i in range(30):
        px = make_pixels(5, i, 24, 24)
        rows.append((f"b{i}", codecs.encode_image(px, "png")))
        if i % 3 == 0:
            rng = np.random.default_rng(i)
            twin = np.clip(
                px.astype(np.float64) + rng.normal(0, 2, px.shape), 0, 255
            ).astype(np.uint8)
            rows.append((f"b{i}-t", codecs.encode_image(twin, "png")))
    rows.append(("bad", b"garbage-not-an-image"))
    return spark.createDataFrame(rows, "image_id string, bytes binary")


def test_image_near_duplicates_finds_planted_twins(spark, twin_images):
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in MM.image_near_duplicates(twin_images, max_hamming=6, blocks=8).collect()}
    for i in range(0, 30, 3):
        key = (f"b{i}", f"b{i}-t")
        assert key in pairs, f"planted twin {key} not reported"
        assert pairs[key] <= 6
    # no cross-base pairs (unrelated images are 26-34 bits apart)
    for (a, b) in pairs:
        assert a.split("-")[0] == b.split("-")[0]


def test_image_near_duplicates_blocked_equals_brute(spark, twin_images):
    ph = (
        MM.decode_stats(twin_images)
        .filter(F.col("decode_ok"))
        .select("image_id", "phash")
    )
    from my_crawler_spark.operators.dedup import hamming_near_pairs

    blocked = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_pairs(ph, "image_id", "phash", 6, 8).collect()
    }
    rows = ph.collect()
    brute = {
        (a.image_id, b.image_id, codecs.hamming64(a.phash, b.phash))
        for a in rows
        for b in rows
        if a.image_id < b.image_id
        and codecs.hamming64(a.phash, b.phash) <= 6
    }
    assert blocked == brute


def test_hamming_near_pairs_rejects_unsound_params():
    with pytest.raises(ValueError):
        from my_crawler_spark.operators.dedup import hamming_near_pairs

        hamming_near_pairs(None, "id", "h", max_hamming=4, blocks=4)


def test_curate_images_end_to_end(spark, twin_images):
    """Decode gate drops the garbage row; exactly one of each planted twin
    pair survives (the lexicographic min, i.e. the base); survivors are
    pairwise non-near under brute force; every survivor gets a split."""
    gated, losers, curated = MM.curate_images(twin_images, max_hamming=6, blocks=8)
    gated_ids = {r.image_id for r in gated.select("image_id").collect()}
    assert "bad" not in gated_ids  # decode gate
    rows = curated.collect()
    survivors = {r.image_id for r in rows}
    for i in range(0, 30, 3):
        assert f"b{i}" in survivors  # keeper = min id = the base
        assert f"b{i}-t" not in survivors  # twin dropped
    # conservation: gated = survivors + dropped duplicates, disjointly
    dropped = {r.image_id for r in losers.collect()}
    assert survivors | dropped == gated_ids and not (survivors & dropped)
    # splits cover every survivor (rates sum to 1.0 -> sentinel path)
    assert all(r.split in ("train", "val", "test") for r in rows)
    # survivors pairwise non-near under brute force
    ph = {r.image_id: r.phash for r in gated.collect()}
    for a in survivors:
        for b in survivors:
            if a < b:
                assert codecs.hamming64(ph[a], ph[b]) > 6


def test_caption_alignment_separates_planted_pairs(spark):
    """Planted TRUE pairs (pixels synthesized from the caption's token
    histogram) score ~1.0 and pass the gate; mismatched pairs (sine
    pixels x unrelated caption) score below it; empty captions score 0."""
    from my_crawler_spark.fixtures import aligned_pixels_for_caption

    rows = []
    for i in range(12):
        caption = " ".join(f"word{(i * 7 + j) % 31}" for j in range(5 + i))
        if i % 2 == 0:
            px = aligned_pixels_for_caption(caption, 20, 20)
        else:
            px = make_pixels(13, i, 20, 20)
        rows.append((f"a{i}", codecs.encode_image(px, "png"), caption))
    rows.append(("empty", codecs.encode_image(make_pixels(13, 99, 20, 20), "png"), ""))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, caption string")
    got = {r.image_id: r for r in MM.caption_alignment(df, threshold=0.95).collect()}
    planted = [got[f"a{i}"].align_score for i in range(0, 12, 2)]
    mismatched = [got[f"a{i}"].align_score for i in range(1, 12, 2)]
    assert min(planted) >= 0.98 and all(got[f"a{i}"].aligned for i in range(0, 12, 2))
    assert max(mismatched) < min(planted)
    assert got["empty"].align_score == 0.0 and got["empty"].aligned is False


def test_caption_features_pure_jvm(spark):
    """The text tower is column expressions only — no Python stage in the
    plan (split/transform/filter/crc32), so it runs inside codegen at any
    scale; and its buckets match a zlib.crc32 recompute."""
    import zlib

    df = spark.createDataFrame(
        [("x", "Alpha beta GAMMA alpha"), ("y", None)], "image_id string, caption string"
    )
    out = MM.caption_features(df, bins=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert node not in plan
    got = {r.image_id: r for r in out.collect()}
    hist = [0.0] * 8
    for t in "alpha beta gamma alpha".split():
        hist[zlib.crc32(t.encode()) % 8] += 0.25
    assert got["x"].caption_n_tokens == 4
    assert all(abs(a - b) < 1e-6 for a, b in zip(got["x"].caption_features, hist))
    assert got["y"].caption_n_tokens == 0 and sum(got["y"].caption_features) == 0.0


def test_laion_gate_first_failure_cascade(spark):
    """Each drop class lands on its first-failed gate; a planted aligned
    pair with passing dims/caption keeps."""
    from my_crawler_spark.fixtures import aligned_pixels_for_caption

    cap = "alpha bravo charlie delta echo"
    rows = [
        ("corrupt", b"junk-bytes", cap),
        ("tiny", codecs.encode_image(make_pixels(7, 1, 8, 8), "png"), cap),
        ("stretched", codecs.encode_image(make_pixels(7, 2, 16, 48), "png"), cap),
        ("shortcap", codecs.encode_image(make_pixels(7, 3, 16, 16), "png"), "hi there"),
        ("misaligned", codecs.encode_image(make_pixels(7, 4, 16, 16), "png"), cap),
        ("good", codecs.encode_image(aligned_pixels_for_caption(cap, 16, 16), "png"), cap),
    ]
    images = spark.createDataFrame(rows, "image_id string, bytes binary, caption string")
    got = {r.image_id: r for r in MM.laion_gate(images).collect()}
    assert got["corrupt"].drop_reason == "decode" and got["corrupt"].w is None
    assert got["tiny"].drop_reason == "size"
    assert got["stretched"].drop_reason == "aspect"
    assert got["shortcap"].drop_reason == "caption"
    assert got["misaligned"].drop_reason == "alignment"
    assert got["good"].keep and got["good"].drop_reason is None
    assert got["good"].align_score > 0.95
    assert sum(1 for r in got.values() if r.keep) == 1


def test_segment_audio_windows(spark):
    """3 s audio at 8 Hz, 1 s window / 0.5 s hop -> 5 segments on the
    half-second grid with 8 samples each; video containers are skipped."""
    rows = [
        ("a-1", MM.fake_media_payload("audio", 3.0, 8, 1)),
        ("v-1", MM.fake_media_payload("video", 3.0, 8, 2)),
    ]
    media = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = sorted(
        MM.segment_audio(media, window_s=1.0, hop_s=0.5).collect(),
        key=lambda r: r.seg_index,
    )
    assert [r.media_id for r in got] == ["a-1"] * 5
    assert [(r.seg_index, r.start_s, r.end_s, r.n_samples) for r in got] == [
        (0, 0.0, 1.0, 8),
        (1, 0.5, 1.5, 8),
        (2, 1.0, 2.0, 8),
        (3, 1.5, 2.5, 8),
        (4, 2.0, 3.0, 8),
    ]


def test_aspect_buckets_nearest_and_shuffle_free(spark):
    from my_crawler_spark.operators.multimodal import ASPECT_BUCKETS, assign_aspect_buckets

    rows = [
        ("sq", 1000, 1000),   # exactly square -> (1024, 1024)
        ("wide", 2048, 512),  # exactly the widest bucket
        ("tall", 500, 2000),  # exactly the tallest bucket (1:4 -> 512x2048)
        ("mid", 900, 1100),
    ]
    df = spark.createDataFrame(rows, ["image_id", "w", "h"])
    got = {r.image_id: r for r in assign_aspect_buckets(df).collect()}
    assert (got["sq"].bucket_w, got["sq"].bucket_h) == (1024, 1024)
    assert (got["wide"].bucket_w, got["wide"].bucket_h) == (2048, 512)
    assert (got["tall"].bucket_w, got["tall"].bucket_h) == (512, 2048)
    # hand argmin for the non-trivial one
    w, h = 900, 1100
    best = min(ASPECT_BUCKETS, key=lambda b: (abs(w * b[2] - h * b[1]) / (h * b[2]), b[0]))
    assert got["mid"].bucket_id == best[0]
    # assignment must be a pure projection: no exchange, no join, no python
    plan = assign_aspect_buckets(df)._jdf.queryExecution().executedPlan().toString()
    for marker in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


def test_decode_stats_phash_invariant_to_batch_composition(spark):
    """An undecodable row in the batch must not perturb its neighbours'
    hashes: pd.DataFrame(rows) used to infer float64 for the phash column
    whenever a None (failed decode) was present, zeroing the low ~11 bits
    of every hash in that Arrow batch (same image deduped within a batch
    but not across batches). Also pins driver==worker equality, which the
    numpy-scalar packing loop broke under the worker's promotion state."""
    from my_crawler_spark import codecs as C
    from my_crawler_spark.fixtures import make_pixels
    from my_crawler_spark.operators.multimodal import decode_stats

    png = C.encode_image(make_pixels(7, 1, 16, 16), "png")
    expected = C.phash64(C.decode_image(png))  # driver-side truth
    mixed = spark.createDataFrame(
        [("a", png), ("broken", b"\x00notapng"), ("b", png)],
        "image_id string, bytes binary",
    ).coalesce(1)
    clean = spark.createDataFrame([("c", png)], "image_id string, bytes binary")
    got_mixed = {r.image_id: r.phash for r in decode_stats(mixed).collect()}
    got_clean = decode_stats(clean).collect()[0].phash
    assert got_mixed["broken"] is None
    assert got_mixed["a"] == got_mixed["b"] == got_clean == expected


def test_jpeg_quality_column_recovers_encoder_setting(spark):
    import numpy as np

    from my_crawler_spark.jpeg import encode_jpeg
    from my_crawler_spark.operators.multimodal import jpeg_quality_column

    img = (np.arange(16 * 16, dtype=np.float64).reshape(16, 16) % 251)
    rgb = np.stack([img] * 3, axis=-1).astype(np.uint8)
    rows = [(q, bytearray(encode_jpeg(rgb, quality=q))) for q in (5, 37, 92)]
    rows.append((0, bytearray(b"not a jpeg")))
    df = spark.createDataFrame(rows, "q long, payload binary")
    got = {r["q"]: r["jpeg_quality"] for r in jpeg_quality_column(df).collect()}
    assert got == {5: 5, 37: 37, 92: 92, 0: None}


# ---------------------------------------------------------------------------
# REAL audio (RIFF/WAVE) and video (AVI/MJPEG) paths through the same
# operators — the round-4 env-gate closed by wav.py / avi.py
# ---------------------------------------------------------------------------
def test_segment_audio_real_wav(spark):
    from my_crawler_spark import wav

    x = np.arange(3500, dtype=np.int16)  # 3.5 s at 1 kHz
    media = spark.createDataFrame(
        [("real", wav.encode_wav(x, 1000)),
         ("vid", MM.fake_media_payload("video", 2.0, 10, 1))],
        "media_id string, bytes binary",
    )
    got = MM.segment_audio(media, window_s=1.0, hop_s=0.5).collect()
    assert {r.media_id for r in got} == {"real"}
    # segments: i*0.5 + 1.0 <= 3.5 -> i in 0..5 -> 6 windows of 1000 samples
    assert sorted(r.seg_index for r in got) == list(range(6))
    assert all(r.n_samples == 1000 for r in got)


def test_audio_segment_energy_exact(spark):
    from my_crawler_spark import wav

    x = (np.arange(2500, dtype=np.int64) * 37 % 65536 - 32768).astype(np.int16)
    media = spark.createDataFrame(
        [("m", wav.encode_wav(x, 1000)), ("junk", b"FAKEMEDIA1audi" + b"\x00" * 9)],
        "media_id string, bytes binary",
    )
    got = {r.seg_index: r for r in MM.audio_segment_energy(media).collect()}
    assert set(got) == {0, 1, 2, 3}  # i*500 + 1000 <= 2500
    s = x.astype(np.int64)
    for i, r in got.items():
        seg = s[i * 500 : i * 500 + 1000]
        assert r.media_id == "m"
        assert r.n_samples == 1000
        assert r.sum_sq == int((seg * seg).sum())
        assert r.peak == int(np.abs(seg).max())


def test_video_frame_stats_real_decode(spark):
    from my_crawler_spark import avi
    from my_crawler_spark.codecs import phash64

    frames = [make_pixels(5, i, 16, 16) for i in range(7)]
    media = spark.createDataFrame(
        [("v", avi.encode_avi_mjpeg(frames, fps=4.0, quality=98)),
         ("aud", MM.fake_media_payload("audio", 2.0, 100, 3))],
        "media_id string, bytes binary",
    )
    got = {r.frame_index: r for r in MM.video_frame_stats(media, target_fps=2.0).collect()}
    assert set(got) == {0, 2, 4, 6}  # every 2nd frame of the 4 fps stream
    for fi, r in got.items():
        assert r.media_id == "v" and r.decode_ok and (r.w, r.h) == (16, 16)
        assert abs(r.ts_s - fi / 4.0) < 1e-9
        # lossy roundtrip: perceptual hash within 2 bits of the source frame
        assert bin(r.phash ^ phash64(frames[fi])).count("1") <= 2


def test_sample_video_frames_real_avi_metadata(spark):
    from my_crawler_spark import avi

    frames = [make_pixels(6, i, 8, 8) for i in range(10)]
    media = spark.createDataFrame(
        [("v", avi.encode_avi_mjpeg(frames, fps=5.0))],
        "media_id string, bytes binary",
    )
    got = MM.sample_video_frames(media, target_fps=1.0).collect()
    assert sorted(r.frame_index for r in got) == [0, 5]  # 2 s at 1 fps


def test_video_frame_stats_animated_gif(spark):
    from my_crawler_spark import gif
    from my_crawler_spark.codecs import phash64

    rng = np.random.default_rng(12)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 64, (16, 16))] for _ in range(8)]
    # 8 frames at 25 cs each -> 2 s, 4 fps; sample at 2 fps -> frames 0,2,4,6
    media = spark.createDataFrame(
        [("g", gif.encode_gif_frames(frames, delay_cs=25))],
        "media_id string, bytes binary",
    )
    got = {r.frame_index: r for r in MM.video_frame_stats(media, target_fps=2.0).collect()}
    assert set(got) == {0, 2, 4, 6}
    for fi, r in got.items():
        assert r.decode_ok and (r.w, r.h) == (16, 16)
        assert abs(r.ts_s - fi * 0.25) < 1e-9
        assert r.phash == phash64(frames[fi])  # GIF is lossless
