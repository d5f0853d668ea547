"""Pure-python GIF codec (87a/89a): LZW, interlace, local/global palettes,
transparency, and multi-frame animations with disposal handling.

Crawl relevance: GIF is still everywhere on the web (memes, UI sprites,
tracking pixels); a crawler's image/dedup pipeline must decode it, and an
animated GIF is the one VIDEO container guaranteed to appear in an HTML
crawl. The reference has no image code (HTML text only); this belongs to
the beyond-reference multimodal suite and is conformance-tested against
the JVM's javax.imageio in tests/test_bmp_gif.py (independent codec,
always present under Spark).

LZW is the GIF flavor (variable 3..12-bit codes, LSB-first packing, clear
and end-of-information codes, dictionary reset at 4096). The inner decode
loop is per-CODE python (each code emits a whole string of pixels); row
de-interlacing and palette application are numpy.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------
def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Per-code loop with an in-place string table: every emitted LZW string
    is a contiguous span of the output buffer, so table entries are just
    (start, length) ints and each emit is ONE bytearray slice copy — no
    per-entry bytes concatenation, no object churn (the r5 per-code
    bytes-table loop allocated `prev + entry[:1]` for every new code).
    A new entry is always `prev + first_byte(current)`, and prev was
    emitted immediately before current, so the entry's bytes sit at
    out[cur - prev_len : cur + 1] — already contiguous. ~2.6x on the
    64x64 decode microbench (see OPTIMIZATION_r06.md)."""
    clear = 1 << min_code_size
    end = clear + 1
    starts = [0] * 4096
    lens = [0] * 4096
    table_len = end + 1
    code_size = min_code_size + 1
    growth = 1 << code_size  # table size at which code_size bumps
    out = bytearray()
    out_append = out.append
    out_len = 0
    prev_len = 0  # 0 = no prev (start / just after clear)
    # batched code extraction: code_size only changes at a clear code or
    # when the table reaches `growth`, and the table grows by at most one
    # entry per code — so from any position at least (growth - table_len)
    # codes share one width and can be sliced out of the bitstream in one
    # numpy pass (3-byte gather, shift, mask). The Python loop below then
    # only runs the table/emit logic, never bit arithmetic.
    bits = np.frombuffer(data, np.uint8)
    total_bits = len(data) * 8
    padded = np.concatenate([bits, np.zeros(4, np.uint8)]).astype(np.uint32)
    bitpos = 0
    while True:
        # refill: at most (growth - table_len) codes share this width (the
        # table grows by <= 1 entry per code); a clear inside the batch
        # rewinds the unconsumed tail
        n_take = growth - table_len + (0 if prev_len else 1)
        avail = (total_bits - bitpos) // code_size
        if n_take < 1:
            # table full (deferred clear): width is pinned until a clear,
            # which rewinds the tail — take everything left
            n_take = avail
        if n_take > avail:
            n_take = avail
        if n_take < 1:
            break
        pos = bitpos + code_size * np.arange(n_take, dtype=np.int64)
        byt = pos >> 3
        val = (
            padded[byt]
            | (padded[byt + 1] << np.uint32(8))
            | (padded[byt + 2] << np.uint32(16))
        )
        codes = (
            ((val >> (pos & 7).astype(np.uint32)) & np.uint32(growth - 1))
            .tolist()  # plain-int list: per-code numpy indexing is ~100ns
        )
        bitpos += code_size * n_take
        for k, code in enumerate(codes):
            if code >= clear:
                if code == clear:
                    # width resets: return the unconsumed tail to the stream
                    bitpos -= code_size * (n_take - k - 1)
                    table_len = end + 1
                    code_size = min_code_size + 1
                    growth = 1 << code_size
                    prev_len = 0
                    break
                if code == end:
                    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)
                if code < table_len:
                    s = starts[code]
                    elen = lens[code]
                    out += out[s : s + elen]
                elif code == table_len and prev_len:  # the KwKwK case
                    s = out_len - prev_len
                    out += out[s:out_len]
                    out_append(out[s])
                    elen = prev_len + 1
                else:
                    raise ValueError("corrupt LZW stream")
            else:
                out_append(code)
                elen = 1
            if prev_len and table_len < 4096:  # tolerate deferred-clear encoders
                starts[table_len] = out_len - prev_len
                lens[table_len] = prev_len + 1
                table_len += 1
                if table_len == growth and code_size < 12:
                    # width bump: any tail was sliced at the old width
                    prev_len = elen
                    out_len += elen
                    bitpos -= code_size * (n_take - k - 1)
                    code_size += 1
                    growth = 1 << code_size
                    break
            prev_len = elen
            out_len += elen
        if out_len >= n_pixels:
            return np.frombuffer(bytes(out[:n_pixels]), np.uint8)
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    it = iter(int(i) for i in indices)
    w = next(it)
    for k in it:
        key = (w, k)
        found = table.get(key)
        if found is not None:
            w = found
            continue
        put(w)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == 1 << code_size and code_size < 12:
            code_size += 1
        if next_code == 4096:
            put(clear)
            table.clear()
            next_code = end + 1
            code_size = min_code_size + 1
        w = k
    put(w)
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------
def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks starting at pos -> (payload,
    position after the 0 terminator)."""
    chunks = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + n])
        pos += n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """GIF bytes -> [(delay_centiseconds, HxWx3 uint8 RGB full canvas)] in
    presentation order, with disposal methods 0-3 and per-frame
    transparency composited the way a browser renders them."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    if gct is not None and bg_idx < len(gct):
        canvas = np.tile(gct[bg_idx], (h, w, 1))
    else:
        canvas = np.zeros((h, w, 3), np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    transparent = None
    disposal = 0
    delay = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags, delay, tidx = struct.unpack_from("<BHB", payload, 0)
                disposal = (flags >> 2) & 0x07
                transparent = tidx if flags & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block {block:#x}")
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame without any color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(lzw, min_code, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        before = canvas.copy() if disposal == 3 else None
        region = canvas[fy : fy + fh, fx : fx + fw]
        px = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region[...] = np.where(mask, px, region)
        else:
            region[...] = px
        frames.append((int(delay), canvas.copy()))
        if disposal == 2:  # restore to background
            bg = gct[bg_idx] if gct is not None and bg_idx < len(gct) else 0
            canvas[fy : fy + fh, fx : fx + fw] = bg
        elif disposal == 3 and before is not None:  # restore to previous
            canvas = before
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First rendered frame as HxWx3 uint8 RGB (what decode_image wants)."""
    return decode_gif_frames(data)[0][1]


def gif_info(data: bytes) -> tuple[int, int, int, int]:
    """Container-walk-only parse -> (n_frames, total_delay_centiseconds,
    width, height). Skips every LZW payload via the declared sub-block
    lengths — NO pixel decode — so animated-GIF duration/fps metadata
    extraction over a binary column is O(container structure), the same
    contract as wav_info/avi_info."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    total_cs = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                total_cs += struct.unpack_from("<H", payload, 1)[0]
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block {block:#x}")
        fpacked = data[pos + 8]
        pos += 9
        if fpacked & 0x80:
            pos += 3 * (2 << (fpacked & 0x07))
        pos += 1  # LZW min code size
        _, pos = _sub_blocks(data, pos)
        n_frames += 1
    return n_frames, total_cs, int(w), int(h)


def _palettize(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """Exact shared palette over all frames (<= 256 distinct colors) ->
    (palette Nx3, per-frame index arrays)."""
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF encode needs <= 256 distinct colors, got {len(palette)}; "
            "quantize first"
        )
    idx_frames = []
    off = 0
    for f in frames:
        n = f.shape[0] * f.shape[1]
        idx_frames.append(
            inverse[off : off + n].astype(np.uint8).reshape(f.shape[:2])
        )
        off += n
    return palette.astype(np.uint8), idx_frames


def encode_gif_frames(frames: list[np.ndarray], delay_cs: int = 10) -> bytes:
    """Frames (uniform HxWx3 uint8, <= 256 distinct colors total) ->
    animated GIF89a with a shared global color table, NETSCAPE loop
    extension, and per-frame graphic-control delay."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one shape")
    palette, idx_frames = _palettize(frames)
    depth = max(1, int(len(palette) - 1).bit_length())
    table_size = 1 << depth
    pal_bytes = np.zeros((table_size, 3), np.uint8)
    pal_bytes[: len(palette)] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal_bytes.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    min_code = max(2, depth)
    for idx in idx_frames:
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode(idx.reshape(-1), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def encode_gif(pixels: np.ndarray) -> bytes:
    """Single HxWx3 uint8 frame (<= 256 distinct colors) -> GIF89a bytes."""
    return encode_gif_frames([pixels])
