"""From-scratch WebP lossless (VP8L) codec tests.

Two angles:

1. Encoder->decoder roundtrips over adversarial shapes/content (lossless:
   exact equality required — this is what the fixture path exercises).
2. Hand-crafted bitstreams, assembled bit-by-bit from the PUBLIC spec's
   layout, for decoder features our encoder never emits: the predictor /
   colour / indexing transforms, meta prefix-code groups, the 2-D "plane"
   distance codes, position-ordered simple codes, and the max_symbol
   cutoff. Expected pixels are computed independently with plain numpy,
   so these are conformance tests, not self-consistency tests.
"""

from __future__ import annotations

import numpy as np
import pytest

from my_crawler_spark import codecs, vp8l
from my_crawler_spark.vp8l import (
    _CODE_TO_PLANE,
    _GREEN_BASE,
    _NUM_LITERALS,
    BitWriter,
    _prefix_encode,
    _write_code,
    decode_vp8l,
    decode_webp,
    encode_webp,
)


def _pack(px: np.ndarray) -> np.ndarray:
    r = px[:, :, 0].astype(np.uint32)
    g = px[:, :, 1].astype(np.uint32)
    b = px[:, :, 2].astype(np.uint32)
    return (np.uint32(0xFF000000) | (r << 16) | (g << 8) | b).ravel()


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _lit_freqs(argb: np.ndarray):
    gf = np.zeros(_GREEN_BASE, np.int64)
    rf = np.zeros(256, np.int64)
    bf = np.zeros(256, np.int64)
    af = np.zeros(256, np.int64)
    df = np.zeros(40, np.int64)
    for v in argb.tolist():
        gf[(v >> 8) & 0xFF] += 1
        rf[(v >> 16) & 0xFF] += 1
        bf[v & 0xFF] += 1
        af[v >> 24] += 1
    return gf, rf, bf, af, df


def _emit_literal(bw: BitWriter, codes, v: int) -> None:
    g, r, b, a, _ = codes
    for table, sym in (
        (g, (v >> 8) & 0xFF),
        (r, (v >> 16) & 0xFF),
        (b, v & 0xFF),
        (a, v >> 24),
    ):
        c, ln = table[sym]
        bw.write_code(c, ln)


def _write_literal_stream(bw: BitWriter, argb: np.ndarray, level0: bool) -> None:
    bw.write(0, 1)  # no colour cache
    if level0:
        bw.write(0, 1)  # no meta prefix image
    codes = tuple(_write_code(bw, f) for f in _lit_freqs(argb))
    for v in argb.tolist():
        _emit_literal(bw, codes, v)


# ---------------------------------------------------------------------------
# roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_noise(seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(px)), px)


@pytest.mark.parametrize(
    "shape",
    [(1, 1), (1, 200), (200, 1), (16, 33), (31, 64), (70, 70)],
)
def test_roundtrip_shapes(shape):
    rng = np.random.default_rng(hash(shape) & 0xFFFF)
    h, w = shape
    for px in (
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
        np.full((h, w, 3), 77, np.uint8),  # flat: long dist-1 runs
    ):
        assert np.array_equal(decode_webp(encode_webp(px)), px)


def test_roundtrip_palette_and_gradient():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    px = pal[rng.integers(0, 4, (40, 17))].astype(np.uint8)
    assert np.array_equal(decode_webp(encode_webp(px)), px)
    g = np.arange(64, dtype=np.uint8)[None, :, None].repeat(31, 0).repeat(3, 2)
    assert np.array_equal(decode_webp(encode_webp(g.copy())), g)


def test_runs_longer_than_max_copy_length():
    # > 4096-pixel flat run must split across copy tokens
    px = np.full((70, 70, 3), 9, np.uint8)
    px[69, 69] = (1, 2, 3)
    data = encode_webp(px)
    assert len(data) < 200  # RLE actually engaged
    assert np.array_equal(decode_webp(data), px)


def test_codecs_integration_and_container():
    from my_crawler_spark.fixtures import make_pixels

    px = make_pixels(42, 11, 24, 24)
    data = codecs.encode_image(px, "webp")
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    assert np.array_equal(codecs.decode_image(data), px)
    assert codecs.psnr(px, codecs.decode_image(data)) == float("inf")
    # container walk skips unknown leading chunks (VP8X-style layout)
    import struct

    vp8l_chunk = data[12:]
    extra = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + extra + vp8l_chunk
    wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(codecs.decode_image(wrapped), px)


def test_lossy_vp8_chunk_is_env_gated():
    import struct

    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"abcd"
    with pytest.raises(NotImplementedError):
        decode_webp(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_plane_table_structure():
    # 120 distinct entries; yoffset 0..7; xoffset -7..8; first two codes are
    # the canonical near neighbours: 1 = pixel above, 2 = pixel left
    assert len(set(_CODE_TO_PLANE)) == 120
    for v in _CODE_TO_PLANE:
        assert 0 <= (v >> 4) <= 7 and -7 <= 8 - (v & 0xF) <= 8
    assert vp8l._plane_to_dist(1, 10) == 10
    assert vp8l._plane_to_dist(2, 10) == 1
    assert vp8l._plane_to_dist(121, 10) == 1  # scalar form
    assert vp8l._plane_to_dist(120 + 999, 10) == 999


# ---------------------------------------------------------------------------
# hand-crafted foreign streams (decoder features our encoder never emits)
# ---------------------------------------------------------------------------


def test_crafted_predictor_transform_mode_top():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    argb = _pack(px).reshape(4, 4)

    def ch(v):  # (a, r, g, b)
        return np.array([(v >> 24) & 255, (v >> 16) & 255, (v >> 8) & 255, v & 255], int)

    res = np.zeros((4, 4), np.uint32)
    for y in range(4):
        for x in range(4):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = ch(int(argb[0, x - 1]))  # top row: L
            elif x == 0:
                pred = ch(int(argb[y - 1, 0]))  # left column: T
            else:
                pred = ch(int(argb[y - 1, x]))  # mode 2 = T
            d = (ch(int(argb[y, x])) - pred) & 0xFF
            res[y, x] = (d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3]
    bw = BitWriter()
    _header(bw, 4, 4)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(0, 3)  # size_bits=2 -> one 4x4 tile
    _write_literal_stream(bw, np.array([(0xFF << 24) | (2 << 8)], np.uint32), False)
    bw.write(0, 1)  # end of transforms
    _write_literal_stream(bw, res.ravel(), True)
    assert np.array_equal(decode_vp8l(bw.getvalue()), px)


def test_crafted_color_transform():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    g2r, g2b, r2b = 32, -17, -32

    def delta(m, c):  # (int8(m) * int8(c)) >> 5, arithmetic
        return int(np.floor_divide(np.int32(np.int8(m)) * np.int32(np.int8(np.uint8(c))), 32))

    fr = np.zeros((4, 4, 3), np.uint8)
    for y in range(4):
        for x in range(4):
            r0, g0, b0 = (int(v) for v in px[y, x])
            rp = (r0 - delta(g2r, g0)) & 0xFF
            bp = (b0 - delta(g2b, g0) - delta(r2b, r0)) & 0xFF
            fr[y, x] = (rp, g0, bp)
    bw = BitWriter()
    _header(bw, 4, 4)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR_TRANSFORM
    bw.write(0, 3)
    tv = (0xFF << 24) | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
    _write_literal_stream(bw, np.array([tv], np.uint32), False)
    bw.write(0, 1)
    _write_literal_stream(bw, _pack(fr), True)
    assert np.array_equal(decode_vp8l(bw.getvalue()), px)


def test_crafted_color_indexing_bundled():
    rng = np.random.default_rng(9)
    pal = np.array([[10, 200, 30], [99, 1, 250], [7, 7, 7]], np.uint8)
    idx = rng.integers(0, 3, (3, 10))
    px = pal[idx].astype(np.uint8)
    pal_argb = _pack(pal[None, :, :])
    p8 = pal_argb.view(np.uint8).reshape(-1, 4).astype(np.int32)
    d8 = p8.copy()
    d8[1:] = (p8[1:] - p8[:-1]) & 0xFF  # palette is delta-coded
    dpal = d8.astype(np.uint8).reshape(-1, 4).copy().view(np.uint32).ravel()
    packed = np.zeros((3, 3), np.uint32)  # width_bits=2: 4 px per packed px
    for y in range(3):
        for xp in range(3):
            gbyte = 0
            for k in range(4):
                x = xp * 4 + k
                if x < 10:
                    gbyte |= int(idx[y, x]) << (2 * k)
            packed[y, xp] = (0xFF << 24) | (gbyte << 8)
    bw = BitWriter()
    _header(bw, 10, 3)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(3 - 1, 8)
    _write_literal_stream(bw, dpal, False)
    bw.write(0, 1)
    _write_literal_stream(bw, packed.ravel(), True)
    assert np.array_equal(decode_vp8l(bw.getvalue()), px)


def test_crafted_meta_prefix_groups():
    rng = np.random.default_rng(10)
    left = rng.integers(0, 128, (4, 4, 3), dtype=np.uint8)
    right = rng.integers(128, 256, (4, 4, 3), dtype=np.uint8)
    px = np.concatenate([left, right], axis=1)  # 8x4, hbits=2 -> 2x1 tiles
    argb = _pack(px).reshape(4, 8)
    bw = BitWriter()
    _header(bw, 8, 4)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix image present
    bw.write(0, 3)  # hbits = 2
    meta = np.array([(0xFF << 24) | (0 << 8), (0xFF << 24) | (1 << 8)], np.uint32)
    _write_literal_stream(bw, meta, False)
    codes0 = tuple(_write_code(bw, f) for f in _lit_freqs(argb[:, :4].ravel()))
    codes1 = tuple(_write_code(bw, f) for f in _lit_freqs(argb[:, 4:].ravel()))
    for y in range(4):
        for x in range(8):
            _emit_literal(bw, codes0 if x < 4 else codes1, int(argb[y, x]))
    assert np.array_equal(decode_vp8l(bw.getvalue()), px)


def _crafted_copy_stream(w, h, lits, copy_len, dist_code):
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    gf, rf, bf, af, df = _lit_freqs(lits)
    lcode, lbits, lextra = _prefix_encode(copy_len)
    gf[_NUM_LITERALS + lcode] += 1
    dcode, dbits, dextra = _prefix_encode(dist_code)
    df[dcode] += 1
    codes = tuple(_write_code(bw, f) for f in (gf, rf, bf, af, df))
    for v in lits.tolist():
        _emit_literal(bw, codes, v)
    c, ln = codes[0][_NUM_LITERALS + lcode]
    bw.write_code(c, ln)
    if lbits:
        bw.write(lextra, lbits)
    c, ln = codes[4][dcode]
    bw.write_code(c, ln)
    if dbits:
        bw.write(dextra, dbits)
    return bw.getvalue()


def test_crafted_plane_code_distances():
    rng = np.random.default_rng(11)
    # plane code 1 = pixel above: second row copies the first
    row = rng.integers(0, 256, (1, 5, 3), dtype=np.uint8)
    px = np.concatenate([row, row], axis=0)
    data = _crafted_copy_stream(5, 2, _pack(px)[:5], copy_len=5, dist_code=1)
    assert np.array_equal(decode_vp8l(data), px)
    # plane code 2 = pixel left: a run
    px2 = np.tile(np.array([[[9, 8, 7]]], np.uint8), (1, 5, 1))
    data = _crafted_copy_stream(5, 1, _pack(px2)[:1], copy_len=4, dist_code=2)
    assert np.array_equal(decode_vp8l(data), px2)


def test_crafted_simple_code_position_order():
    # simple 2-symbol codes map code 0 to the FIRST transmitted symbol,
    # even when it is numerically larger — not canonical order
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(1, 1)  # green: simple
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # 8-bit first symbol
    bw.write(200, 8)
    bw.write(3, 8)
    for s in (11, 22, 255, 0):  # red/blue/alpha/dist single-symbol codes
        bw.write(1, 1)
        bw.write(0, 1)
        if s <= 1:
            bw.write(0, 1)
            bw.write(s, 1)
        else:
            bw.write(1, 1)
            bw.write(s, 8)
    bw.write(0, 1)  # code 0 -> green 200
    bw.write(1, 1)  # code 1 -> green 3
    exp = np.array([[[11, 200, 22], [11, 3, 22]]], np.uint8)
    assert np.array_equal(decode_vp8l(bw.getvalue()), exp)


def test_crafted_max_symbol_cutoff():
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)  # green: normal code
    bw.write(0, 4)  # num_code_lengths = 4 (order 17, 18, 0, 1)
    for ln in (0, 0, 1, 1):
        bw.write(ln, 3)
    bw.write(1, 1)  # use max_symbol
    bw.write(0, 3)  # length_nbits = 2
    bw.write(0, 2)  # max_symbol = 2: the other 278 lengths are implicit 0
    bw.write_code(1, 1)  # code-length symbol 1 (green sym 0 -> len 1)
    bw.write_code(1, 1)  # code-length symbol 1 (green sym 1 -> len 1)
    for s in (44, 55, 255, 0):
        bw.write(1, 1)
        bw.write(0, 1)
        if s <= 1:
            bw.write(0, 1)
            bw.write(s, 1)
        else:
            bw.write(1, 1)
            bw.write(s, 8)
    bw.write_code(0, 1)
    bw.write_code(1, 1)
    exp = np.array([[[44, 0, 55], [44, 1, 55]]], np.uint8)
    assert np.array_equal(decode_vp8l(bw.getvalue()), exp)


def test_bitreader_wide_reads_exact():
    """Regression (ADVICE r5, high): the peek window must cover the 17/18
    extra-bit reads of distance prefix codes 36-39 — a 16-bit window
    silently dropped the high bits (read(18) of 0x2ABCD gave 0xABCD)."""
    from my_crawler_spark.vp8l import BitReader

    bw = BitWriter()
    bw.write(0x2ABCD, 18)
    bw.write(0x1F0F1, 17)
    bw.write(0x3, 2)
    br = BitReader(bw.getvalue())
    assert br.read(18) == 0x2ABCD
    assert br.read(17) == 0x1F0F1
    assert br.read(2) == 0x3
    with pytest.raises(ValueError, match="exceeds the bit window"):
        br.read(19)


def test_crafted_code39_long_distance_copy():
    """A conformant stream whose final backref uses distance prefix code 39
    (18 extra bits, distance 1,000,000) must decode exactly — the stream
    shape of large (>0.5 Mpixel) lossless webps (ADVICE r5, high)."""
    rng = np.random.default_rng(7)
    w, h = 4096, 257
    lits = _pack(rng.integers(0, 256, (1, w, 3), dtype=np.uint8))
    long_dist = 1_000_000
    copies = [(4096, 4096 + 120)] * 255 + [(64, long_dist + 120),
                                           (4032, 4096 + 120)]
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    gf, rf, bf, af, df = _lit_freqs(lits)
    enc = []
    for clen, dcode_raw in copies:
        lcode, lbits, lextra = _prefix_encode(clen)
        dcode, dbits, dextra = _prefix_encode(dcode_raw)
        gf[_NUM_LITERALS + lcode] += 1
        df[dcode] += 1
        enc.append((lcode, lbits, lextra, dcode, dbits, dextra))
    codes = tuple(_write_code(bw, f) for f in (gf, rf, bf, af, df))
    for v in lits.tolist():
        _emit_literal(bw, codes, v)
    for lcode, lbits, lextra, dcode, dbits, dextra in enc:
        c, ln = codes[0][_NUM_LITERALS + lcode]
        bw.write_code(c, ln)
        if lbits:
            bw.write(lextra, lbits)
        c, ln = codes[4][dcode]
        bw.write_code(c, ln)
        if dbits:
            bw.write(dextra, dbits)
    got = decode_vp8l(bw.getvalue())
    # reference: replay the copy program over a flat argb buffer
    flat = np.zeros(w * h, np.uint32)
    flat[:w] = lits
    pos = w
    for clen, dcode_raw in copies:
        dist = dcode_raw - 120
        assert dist >= clen  # this test only uses non-overlapping copies
        flat[pos : pos + clen] = flat[pos - dist : pos - dist + clen]
        pos += clen
    assert pos == w * h
    want = np.stack(
        [(flat >> 16) & 0xFF, (flat >> 8) & 0xFF, flat & 0xFF], axis=-1
    ).astype(np.uint8).reshape(h, w, 3)
    assert np.array_equal(got, want)


def test_truncated_streams_raise_valueerror():
    """Truncation anywhere must surface as ValueError (the module's error
    contract), never IndexError from the peek table (ADVICE r5, low)."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = vp8l.encode_vp8l(px)
    bad = 0
    for cut in range(5, len(data)):
        try:
            vp8l.decode_vp8l(data[:cut])
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001
            bad += 1
    assert bad == 0


def test_webp_truncated_chunk_raises():
    full = encode_webp(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_webp(full[:20])


def test_simple_code_symbol_out_of_alphabet_rejected():
    """A malformed distance tree transmitting symbol 200 (alphabet 40) must
    raise, not feed a 99-bit read (ADVICE r5, low)."""
    from my_crawler_spark.vp8l import BitReader, _read_code

    bw = BitWriter()
    bw.write(1, 1)  # simple code
    bw.write(0, 1)  # one symbol
    bw.write(1, 1)  # 8-bit symbol form
    bw.write(200, 8)  # out of a 40-symbol alphabet
    with pytest.raises(ValueError, match="out of alphabet"):
        _read_code(BitReader(bw.getvalue()), 40)
