"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with metadata structs; all
processing is Arrow-batched ``mapInPandas`` — schema, batch shape and
partitioning are real and tested. Decoders:

- images: real (pure-numpy PNG, baseline JPEG, GIF, BMP, and WebP
  lossless/VP8L — codecs.py / jpeg.py / gif.py / bmp.py / vp8l.py)
- audio: REAL for RIFF/WAVE payloads (pure-numpy PCM/float codec, wav.py);
  video: REAL for AVI/MJPEG payloads (container parse + the from-scratch
  JPEG codec, avi.py). The deterministic fake container
  (``fake_media_payload``) remains supported for formats with no in-repo
  codec (webp video streams etc.); anything else raises
  NotImplementedError with the environment note.

Operators:
- decode_stats     : decode + (w, h, mean_luma, phash) per image row
- image_near_duplicates: perceptual near-dup pairs — phash + the shared
  pigeonhole Hamming join from operators/dedup.py (exact, JVM-side)
- resize_images    : area-mean downsample to (w, h), re-encoded png
- image_features   : tiny deterministic feature vector (luma histogram) —
  the hook where a real vision encoder would slot in
- caption_features : deterministic pseudo text encoder (token-hash
  histogram, pure JVM expressions — no Python stage) sharing the image
  feature space; the hook where a real text tower would slot in
- caption_alignment: cross-modal alignment score per (image, caption)
  row — the CLIP-filtering slot of a LAION-style curation pipeline,
  with deterministic stand-in encoders and real Spark plumbing
- sample_video_frames: frame indices at a target fps from container
  metadata (real AVI/MJPEG or fake; header-only)
- audio_segment_energy: REAL PCM decode (wav.py) -> exact int64 windowed
  energy/peak per segment
- video_frame_stats : REAL frame decode (avi.py + jpeg.py) -> per-sampled-
  frame (w, h, phash64), lazy container walk
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codecs

_FAKE_MEDIA_MAGIC = b"FAKEMEDIA1"


def fake_media_payload(kind: str, duration_s: float, rate: int, seed: int) -> bytes:
    """Deterministic stand-in for an audio/video bitstream: header carries
    (kind, duration, rate); body is seeded noise. Clearly marked fake."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * rate) if kind == "audio" else int(duration_s * rate) * 16
    body = rng.integers(0, 255, size=min(n, 65536), dtype=np.uint8).tobytes()
    head = _FAKE_MEDIA_MAGIC + kind.encode()[:5].ljust(5) + struct.pack(">fI", duration_s, rate)
    return head + zlib.compress(body, 1)


def _parse_media(data: bytes) -> tuple[str, float, float]:
    """Sniff a media payload -> (kind, duration_s, rate).

    REAL containers first: RIFF/WAVE via the pure-numpy wav codec
    (rate = sample rate) and RIFF/AVI MJPEG via the container parser
    (rate = fps) — both header-only O(1) parses, no payload decode.
    Falls back to the deterministic fake container; anything else is the
    documented environment gate (no third-party codec libs here)."""
    if data[:10] == _FAKE_MEDIA_MAGIC:
        kind = data[10:15].rstrip(b" ").decode()
        duration, rate = struct.unpack(">fI", data[15:23])
        return kind, float(duration), float(rate)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        from .. import wav

        n, rate, _ch, _bits, _fmt = wav.wav_info(data)
        return "audio", n / rate, float(rate)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from .. import avi

        n, fps, _w, _h = avi.avi_info(data)
        return "video", n / fps, float(fps)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from .. import gif

        n, total_cs, _w, _h = gif.gif_info(data)
        rate = n * 100.0 / total_cs if total_cs else 10.0
        return "video", n / rate, rate
    raise NotImplementedError(
        "unrecognized media container: real decode beyond RIFF/WAVE and "
        "AVI/MJPEG needs codec libs not present in this environment"
    )


# Back-compat alias (original stub-era name; same contract, narrower input).
_parse_fake_media = _parse_media


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def decode_stats(images: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    px = codecs.decode_image(bytes(data))
                    # integer milli-luma: the sum is an exact int64, so the
                    # mean is one correctly-rounded division — bit-identical
                    # in every worker (float dgemv here was context-sensitive,
                    # see codecs._DCT32_Q)
                    lm = px.astype(np.int64) @ np.array([299, 587, 114], np.int64)
                    rows.append(
                        (iid, px.shape[1], px.shape[0],
                         float(int(lm.sum())) / (1000.0 * lm.size),
                         codecs.phash64(px), True)
                    )
                except Exception:
                    rows.append((iid, None, None, None, None, False))
            cols = [f.name for f in DECODE_STATS_SCHEMA.fields]
            out = {c: [r[i] for r in rows] for i, c in enumerate(cols)}
            # Explicit nullable Int64 for the hash: pd.DataFrame(rows) infers
            # float64 for an int column containing any None (undecodable
            # row), silently zeroing the low ~11 bits of EVERY phash in the
            # Arrow batch — the same image then deduped within a batch but
            # not across batches. w/h are Int64 too (exact anyway, but the
            # declared schema is long).
            for c in ("w", "h", "phash"):
                out[c] = pd.array(out[c], dtype="Int64")
            yield pd.DataFrame(out, columns=cols)

    return images.select("image_id", "bytes").mapInPandas(run, DECODE_STATS_SCHEMA)


def image_near_duplicates(
    images: DataFrame, max_hamming: int = 6, blocks: int = 8
) -> DataFrame:
    """Perceptual near-duplicate image pairs: decode -> 64-bit phash
    (one Arrow pass) -> pigeonhole-blocked Hamming join (pure JVM).

    The phash separation is wide (noise-perturbed twins measure 0-4 bits
    apart on the fixture distribution; unrelated images 26-34), so a
    6-bit ball with 8 blocks is exact AND selective: 8-bit chunk keys
    bucket ~n/256 rows each, keeping the candidate term ~n^2/2^14 before
    the bit_count verify. At 10^9+ images drop to blocks=4/hamming<=3
    (16-bit keys) or prefix the chunk key with a coarse feature.
    Undecodable rows are excluded (decode_ok false)."""
    from .dedup import hamming_near_pairs

    ph = decode_stats(images).filter(F.col("decode_ok")).select("image_id", "phash")
    return hamming_near_pairs(ph, "image_id", "phash", max_hamming, blocks)


def curate_images(
    images: DataFrame,
    max_hamming: int = 6,
    blocks: int = 8,
    splits: dict[str, float] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """End-to-end image curation — the image-axis analogue of the text
    corpus pipeline: decode gate -> perceptual near-dup keeper selection ->
    deterministic split. Keeper = min image_id of the transitive
    phash-Hamming cluster (canonical choice is a pure function of the
    cluster, so it never shifts when gates are retuned); undecodable rows
    fall at the gate; default splits 90/5/5 sum to 1.0 so every keeper is
    assigned. Returns (gated, dropped_duplicates, curated) — curated has
    (image_id, phash, split). Every stage is relational or one Arrow
    decode pass; the pair join and the component loop shuffle on bounded
    keys, so the chain holds at 10^9 images with the blocks/hamming
    scaling noted on image_near_duplicates."""
    from .dedup import duplicate_clusters, hamming_near_pairs
    from .sampling import split_assign

    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    gated = (
        decode_stats(images)
        .filter(F.col("decode_ok") & (F.col("w") > 0) & (F.col("h") > 0))
        .select("image_id", "phash")
    )
    pairs = hamming_near_pairs(gated, "image_id", "phash", max_hamming, blocks)
    clusters = duplicate_clusters(pairs)
    losers = clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("image_id")
    )
    keepers = gated.join(losers, "image_id", "left_anti")
    curated = split_assign(keepers, "image_id", splits)
    return gated, losers, curated


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
    ]
)


def _area_resize(px: np.ndarray, w: int, h: int) -> np.ndarray:
    H, W, _ = px.shape
    yi = (np.arange(H) * h // H).clip(0, h - 1)
    xi = (np.arange(W) * w // W).clip(0, w - 1)
    out = np.zeros((h, w, 3))
    cnt = np.zeros((h, w, 1))
    np.add.at(out, (yi[:, None].repeat(W, 1), xi[None, :].repeat(H, 0)), px)
    np.add.at(cnt, (yi[:, None].repeat(W, 1), xi[None, :].repeat(H, 0)), 1.0)
    return np.clip(out / np.maximum(cnt, 1), 0, 255).astype(np.uint8)


def resize_images(images: DataFrame, w: int, h: int) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                px = codecs.decode_image(bytes(data))
                rows.append((iid, codecs.encode_png(_area_resize(px, w, h)), w, h))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return images.select("image_id", "bytes").mapInPandas(run, RESIZE_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def image_features(images: DataFrame, bins: int = 16) -> DataFrame:
    """Luma-histogram feature vector — the slot a real vision encoder fills."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                px = codecs.decode_image(bytes(data))
                # integer milli-luma + integer bin edges: no value can sit
                # on a context-sensitive float boundary (see codecs._DCT32_Q)
                lm = px.astype(np.int64) @ np.array([299, 587, 114], np.int64)
                hist, _ = np.histogram(lm, bins=bins, range=(0, 256000))
                v = hist.astype(np.float32)
                v /= v.sum() or 1.0
                rows.append((iid, v))
            yield pd.DataFrame(rows, columns=["image_id", "features"])

    return images.select("image_id", "bytes").mapInPandas(run, FEATURES_SCHEMA)


def caption_features(
    df: DataFrame,
    caption_col: str = "caption",
    bins: int = 16,
    out_col: str = "caption_features",
) -> DataFrame:
    """Deterministic pseudo text encoder: whitespace-tokenize, bucket each
    token by crc32 into ``bins`` slots, L1-normalized histogram — the same
    feature space as ``image_features`` so the two towers can be scored
    against each other. Pure JVM column expressions (split/transform/
    filter/crc32), no Python stage; crc32 (not xxhash64) so fixtures and
    the soundness oracle can recompute buckets with ``zlib.crc32``.

    Space-less CJK captions collapse to one token (one spike) — the honest
    behavior of a whitespace stand-in where a real tokenizer would slot in.
    Adds ``caption_n_tokens`` (0 for empty captions -> zero vector)."""
    tokens = F.filter(
        F.split(F.lower(F.coalesce(F.col(caption_col), F.lit(""))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    bids = F.transform(tokens, lambda t: F.pmod(F.crc32(F.encode(t, "UTF-8")), F.lit(bins)))
    n = F.size(bids)

    def _eq(i):  # NB: a 2-arg lambda would be read as filter's (elem, idx) form
        return lambda b: b == F.lit(i)

    hist = F.array(*[F.size(F.filter(bids, _eq(i))) for i in range(bins)])
    feats = F.transform(hist, lambda c: (c / F.greatest(n, F.lit(1))).cast("float"))
    return df.withColumn("caption_n_tokens", n).withColumn(out_col, feats)


def caption_alignment(
    images: DataFrame, bins: int = 16, threshold: float = 0.95
) -> DataFrame:
    """Cross-modal caption-image alignment score — the CLIP-score gate of a
    LAION-style pipeline (keep pairs whose image and caption embeddings
    agree; drop mismatched scrapes). Encoders are deterministic stand-ins
    (luma histogram / token-hash histogram in a shared ``bins``-d space);
    the plumbing — one Arrow decode pass, JVM text featurization, JVM
    cosine, threshold gate — is the real shape.

    Returns (image_id, align_score, aligned). Empty captions score 0.0
    (nothing to align); degenerate zero vectors land on 0.0 via nanvl."""
    from pyspark import StorageLevel

    from .search import cosine

    # both feature branches read the image rows; persisting keeps any
    # (possibly expensive, Python-stage) upstream from running twice
    images = images.persist(StorageLevel.MEMORY_AND_DISK)
    feats = image_features(images, bins=bins)
    caps = caption_features(images.select("image_id", "caption"), bins=bins)
    score = F.when(F.col("caption_n_tokens") == 0, F.lit(0.0)).otherwise(
        F.nanvl(cosine(F.col("features"), F.col("caption_features")), F.lit(0.0))
    )
    return (
        feats.join(caps, "image_id")
        .select("image_id", score.alias("align_score"))
        .withColumn("aligned", F.col("align_score") >= F.lit(threshold))
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("ts_s", T.DoubleType()),
    ]
)


def sample_video_frames(media: DataFrame, target_fps: float = 1.0) -> DataFrame:
    """Frame-index sampling at a target fps from container metadata — a
    header-only O(1) parse per row (real AVI/MJPEG and WAV via
    ``_parse_media``, or the fake container). For sampled-frame PIXELS see
    ``video_frame_stats``, which decodes the selected frames for real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                kind, duration, rate = _parse_media(bytes(data))
                if kind != "video":
                    continue
                step = max(int(rate / target_fps), 1)
                for fi in range(0, int(round(duration * rate)), step):
                    rows.append((mid, fi, fi / rate))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select("media_id", "bytes").mapInPandas(run, FRAME_SCHEMA)


def laion_gate(
    images: DataFrame,
    min_dim: int = 16,
    max_aspect: float = 2.0,
    min_caption_tokens: int = 3,
    bins: int = 16,
    align_threshold: float = 0.95,
) -> DataFrame:
    """LAION/DataComp-style image-text pair curation gate — the filter
    stack those pipelines run over billions of scraped pairs before
    training: decodability, minimum resolution, aspect-ratio bounds,
    minimum caption length, and the CLIP-score alignment gate (stand-in
    encoders; see caption_alignment).

    Returns one row per input image: (image_id, w, h, caption_n_tokens,
    align_score, drop_reason, keep). drop_reason is the FIRST failed gate
    in the fixed order decode -> size -> aspect -> caption -> alignment
    (the cheap-to-expensive order a 100 TB pipeline uses so later gates
    only run on survivors); NULL means kept. Undecodable rows carry NULL
    w/h/align_score.

    Plan: one Arrow decode pass for stats, one for the alignment tower
    (only over decodable rows — image_features raises on garbage bytes),
    JVM caption featurization, two hash joins on image_id. At scale,
    decode once and thread the pixel batch through both towers; here the
    two passes keep each operator independently testable.
    """
    stats = decode_stats(images)
    ok_ids = stats.filter(F.col("decode_ok")).select("image_id")
    align = caption_alignment(
        images.join(ok_ids, "image_id"), bins=bins, threshold=align_threshold
    )
    caps = caption_features(images.select("image_id", "caption"), bins=bins).select(
        "image_id", "caption_n_tokens"
    )
    j = stats.join(caps, "image_id").join(align, "image_id", "left")
    reason = (
        F.when(~F.col("decode_ok"), F.lit("decode"))
        .when(F.least("w", "h") < F.lit(min_dim), F.lit("size"))
        .when(
            F.greatest("w", "h").cast("double")
            > F.lit(float(max_aspect)) * F.least("w", "h"),
            F.lit("aspect"),
        )
        .when(F.col("caption_n_tokens") < F.lit(min_caption_tokens), F.lit("caption"))
        .when(~F.col("aligned"), F.lit("alignment"))
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        "image_id",
        "w",
        "h",
        F.col("caption_n_tokens").cast("long").alias("caption_n_tokens"),
        "align_score",
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
    )


SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("seg_index", T.IntegerType()),
        T.StructField("start_s", T.DoubleType()),
        T.StructField("end_s", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def segment_audio(
    media: DataFrame, window_s: float = 1.0, hop_s: float = 0.5
) -> DataFrame:
    """Audio segmentation from container metadata (REAL RIFF/WAVE headers
    via the pure-numpy wav codec, or the fake container) — the
    fixed-window/hop framing every audio featurizer (fbank/VAD/Whisper-style
    chunking) starts from; header-only, no PCM conversion. Full windows
    only: segment i covers [i*hop, i*hop + window] while it fits the
    duration. Non-audio containers are skipped. One Arrow pass. For
    per-segment sample statistics over real PCM see
    ``audio_segment_energy``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                kind, duration, rate = _parse_media(bytes(data))
                if kind != "audio":
                    continue
                si = 0
                while si * hop_s + window_s <= duration + 1e-9:
                    start = si * hop_s
                    rows.append(
                        (mid, si, start, start + window_s, int(window_s * rate))
                    )
                    si += 1
            yield pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    return media.select("media_id", "bytes").mapInPandas(run, SEGMENT_SCHEMA)


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("seg_index", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def audio_segment_energy(
    media: DataFrame, window_s: float = 1.0, hop_s: float = 0.5
) -> DataFrame:
    """REAL PCM decode + per-segment energy over RIFF/WAVE binary columns —
    the first feature pass of any audio curation pipeline (VAD gating,
    silence trimming, loudness bucketing all start from windowed energy).

    Per full window [i*hop, i*hop + window): n_samples, sum of squared
    samples and max |sample| — EXACT int64s over integer PCM (channel-summed
    squares), so results are bit-identical across engines and the entry's
    DuckDB oracle hash-matches instead of settling for a float tolerance.
    Non-WAV payloads (fake containers, AVI video) are skipped.

    Plan: one Arrow ``mapInPandas`` pass; per row the codec is whole-buffer
    ``np.frombuffer`` + vectorized square/sum — no per-sample Python. At
    10^10 rows this is map-only work partitioned by whatever key the media
    table carries (no shuffle introduced)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .. import wav

        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                data = bytes(data)
                if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
                    continue
                samples, rate = wav.decode_wav(data)
                s = samples.astype(np.int64)
                win = int(round(window_s * rate))
                hop = int(round(hop_s * rate))
                n = s.shape[0]
                si = 0
                while si * hop + win <= n:
                    seg = s[si * hop : si * hop + win]
                    rows.append(
                        (
                            mid,
                            si,
                            seg.shape[0],
                            int((seg * seg).sum()),
                            int(np.abs(seg).max(initial=0)),
                        )
                    )
                    si += 1
            yield pd.DataFrame(rows, columns=[f.name for f in ENERGY_SCHEMA.fields])

    return media.select("media_id", "bytes").mapInPandas(run, ENERGY_SCHEMA)


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("ts_s", T.DoubleType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("phash", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def video_frame_stats(media: DataFrame, target_fps: float = 1.0) -> DataFrame:
    """REAL video frame decode over binary columns — AVI/MJPEG (avi.py +
    the from-scratch JPEG codec) and animated GIF (gif.py): sample frames
    at ``target_fps`` -> (frame_index, ts, w, h, phash64) per frame — the
    shot-sampling + perceptual-fingerprint pass a video training-data
    pipeline runs before frame-level dedup/curation.

    The AVI container walk is lazy (``iter_avi_frames``), so at 1 fps over
    a 30 fps stream 29/30 frames skip WITHOUT paying JPEG cost; GIF frames
    composite onto a shared canvas so all must decode, and ts is the exact
    cumulative per-frame delay. Undecodable sampled AVI frames keep a row
    with decode_ok=false (same degradation contract as image decode_stats).
    Other payloads are skipped. One Arrow pass, no shuffle introduced."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .. import avi, gif

        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                data = bytes(data)
                if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                    _n, fps, _w, _h = avi.avi_info(data)
                    step = max(int(fps / target_fps), 1)
                    for fi, payload in avi.iter_avi_frames(data):
                        if fi % step:
                            continue
                        try:
                            px = codecs.decode_image(payload)
                            rows.append(
                                (mid, fi, fi / fps, px.shape[1], px.shape[0],
                                 codecs.phash64(px), True)
                            )
                        except Exception:
                            rows.append((mid, fi, fi / fps, None, None, None, False))
                elif data[:6] in (b"GIF87a", b"GIF89a"):
                    # animated GIF: frames composite onto a shared canvas,
                    # so ALL frames decode (no lazy skip possible); ts is
                    # the exact cumulative per-frame delay, not a constant
                    # rate — GIFs may vary delay mid-stream
                    n, total_cs, _w, _h = gif.gif_info(data)
                    rate = n * 100.0 / total_cs if total_cs else 10.0
                    step = max(int(rate / target_fps), 1)
                    t_cs = 0
                    for fi, (delay, px) in enumerate(gif.decode_gif_frames(data)):
                        if fi % step == 0:
                            rows.append(
                                (mid, fi, t_cs / 100.0, px.shape[1],
                                 px.shape[0], codecs.phash64(px), True)
                            )
                        t_cs += delay
            cols = [f.name for f in FRAME_STATS_SCHEMA.fields]
            out = {c: [r[i] for r in rows] for i, c in enumerate(cols)}
            # nullable Int64 — same Arrow float64-inference hazard as
            # decode_stats (a None would silently truncate every phash)
            for c in ("w", "h", "phash"):
                out[c] = pd.array(out[c], dtype="Int64")
            yield pd.DataFrame(out, columns=cols)

    return media.select("media_id", "bytes").mapInPandas(run, FRAME_STATS_SCHEMA)


# SDXL-style resolution buckets: ~1024^2 pixels at 64-px-aligned aspect
# steps. Training batches must be shape-homogeneous, so every image is
# assigned to the bucket whose aspect ratio is nearest its own (NovelAI /
# SDXL bucketed batching), then resized to that bucket's (w, h).
ASPECT_BUCKETS: list[tuple[int, int, int]] = [
    (i, w, h)
    for i, (w, h) in enumerate(
        [
            (512, 2048), (576, 1728), (640, 1536), (704, 1408),
            (768, 1344), (832, 1216), (896, 1152), (1024, 1024),
            (1152, 896), (1216, 832), (1344, 768), (1408, 704),
            (1536, 640), (1728, 576), (2048, 512),
        ]
    )
]


def assign_aspect_buckets(images: DataFrame, w_col: str = "w", h_col: str = "h") -> DataFrame:
    """Nearest-aspect bucket per image -> original cols + (bucket_id,
    bucket_w, bucket_h, aspect_err).

    Distance is |w/h - bw/bh| computed as |w*bh - h*bw| / (h*bh) — integer
    cross-multiplication then ONE double division, so the value is
    bit-identical across engines (no log, no libm). Ties break to the
    lower bucket_id.

    Plan: the bucket table is a LITERAL array; assignment is array_sort
    over a 15-element transform — a pure per-row projection, NO join and
    NO shuffle. At 10^10 rows this is map-only work that pipelines into
    whichever exchange follows (the groupBy on bucket_id that forms
    homogeneous batches).
    """
    buckets = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), F.lit(w).alias("bw"), F.lit(h).alias("bh")
            )
            for i, w, h in ASPECT_BUCKETS
        ]
    )
    w, h = F.col(w_col).cast("long"), F.col(h_col).cast("long")
    scored = F.transform(
        buckets,
        lambda b: F.struct(
            (
                F.abs((w * b["bh"] - h * b["bw"]).cast("double"))
                / (h * b["bh"]).cast("double")
            ).alias("err"),
            b["i"].alias("i"),
            b["bw"].alias("bw"),
            b["bh"].alias("bh"),
        ),
    )
    best = F.element_at(F.array_sort(scored), 1)
    return images.select(
        "*",
        best["i"].alias("bucket_id"),
        best["bw"].alias("bucket_w"),
        best["bh"].alias("bucket_h"),
        F.round(best["err"], 6).alias("aspect_err"),
    )


def jpeg_quality_column(
    df: DataFrame, bytes_col: str = "payload", out_col: str = "jpeg_quality"
) -> DataFrame:
    """Adds the encoder quality setting recovered from each JPEG payload's
    luma DQT (jpeg.py::estimate_jpeg_quality — exact for ijg-formula
    encoders, nearest-table otherwise, NULL for non-JPEG bytes). JPEG
    quality is a provenance/quality signal image-corpus curation buckets
    on (thumbnails re-encoded at q<=70 vs originals). One Arrow batch
    stage, no decode — only the marker walk runs."""
    from ..jpeg import estimate_jpeg_quality

    @F.pandas_udf("int")
    def _est(payloads: pd.Series) -> pd.Series:
        vals = [
            None if b is None else estimate_jpeg_quality(bytes(b))
            for b in payloads
        ]
        return pd.Series(pd.array(vals, dtype="Int32"))

    return df.withColumn(out_col, _est(F.col(bytes_col)))


EXIF_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("exif_datetime", T.StringType()),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("has_gps", T.BooleanType()),
        T.StructField("gps_lat", T.DoubleType()),
        T.StructField("gps_lon", T.DoubleType()),
    ]
)


def exif_stats(images: DataFrame) -> DataFrame:
    """EXIF metadata per image row (exif.py — pure-Python APP1/TIFF walk,
    both endiannesses): orientation / timestamp / camera for curation,
    has_gps + coordinates for the PII audit. One Arrow batch stage; only
    the segment chain up to SOS is walked — no pixel decode. Non-JPEG or
    EXIF-less payloads parse to all-NULL rows, not errors."""
    from .. import exif as X

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in EXIF_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    m = X.parse_exif(bytes(data))
                except Exception:
                    m = dict.fromkeys(
                        ("orientation", "datetime", "make", "model",
                         "gps_lat", "gps_lon"), None) | {"has_gps": False}
                rows.append(
                    (iid, m["orientation"], m["datetime"], m["make"],
                     m["model"], bool(m["has_gps"]), m["gps_lat"], m["gps_lon"])
                )
            out = {c: [r[i] for r in rows] for i, c in enumerate(cols)}
            out["orientation"] = pd.array(out["orientation"], dtype="Int32")
            yield pd.DataFrame(out, columns=cols)

    return images.select("image_id", "bytes").mapInPandas(run, EXIF_STATS_SCHEMA)


SCRUB_EXIF_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("had_gps", T.BooleanType()),
    ]
)


def scrub_exif_gps(images: DataFrame) -> DataFrame:
    """GPS-PII scrub over the binary image column (exif.py::strip_gps):
    the GPS IFD and its pointer entry are removed from the APP1 and every
    other EXIF entry is re-laid-out verbatim — camera metadata survives,
    the entropy-coded pixels are byte-identical, and GPS-less payloads
    pass through untouched (had_gps=false). This is the image-side twin
    of textstats' pii_scrub: location EXIF is PII baked into the
    container, and a crawled-image corpus must shed it before training.
    One Arrow batch stage, no decode."""
    from .. import exif as X

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs, had = [], [], []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                raw = bytes(data)
                try:
                    cleaned = X.strip_gps(raw)
                except Exception:
                    cleaned = raw
                ids.append(iid)
                outs.append(cleaned)
                had.append(cleaned != raw)
            yield pd.DataFrame(
                {"image_id": ids, "bytes": outs, "had_gps": had},
                columns=["image_id", "bytes", "had_gps"],
            )

    return images.select("image_id", "bytes").mapInPandas(run, SCRUB_EXIF_SCHEMA)
