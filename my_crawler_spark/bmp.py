"""Pure-numpy BMP codec (Windows DIB, uncompressed BI_RGB).

Crawl relevance: BMP still appears in the wild (old CMSes, scanned-doc
hosts); a crawler's image pipeline must at least decode it to phash/dedup.
The reference has no image code (it crawls HTML text); this belongs to the
beyond-reference multimodal suite and is conformance-tested against the
JVM's javax.imageio in tests/test_bmp_gif.py (independent third-party
codec, always present under Spark).

Supported: BITMAPINFOHEADER (40) and the V4/V5 extensions (108/124) as
written by common encoders; 8-bit palettized, 24-bit and 32-bit BI_RGB;
bottom-up and top-down row order. Everything is whole-array numpy slicing
— no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit bottom-up BI_RGB bytes (the canonical
    interchange layout: BITMAPFILEHEADER + BITMAPINFOHEADER, rows padded
    to 4 bytes, BGR channel order)."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    raw = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raw), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0)
    return header + info + raw


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> HxWx3 uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h_signed, _planes, bpp, compression = struct.unpack_from("<iiHHI", data, 18)
    if compression not in (0, 3):  # BI_RGB or BI_BITFIELDS-with-default-masks
        raise ValueError(f"unsupported BMP compression {compression}")
    top_down = h_signed < 0
    h = abs(h_signed)
    if bpp == 8:
        (clr_used,) = struct.unpack_from("<I", data, 46)
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data, np.uint8, n_colors * 4, pal_off).reshape(-1, 4)
        palette = pal[:, 2::-1]  # BGRX -> RGB
        stride = (w + 3) & ~3
        idx = np.frombuffer(data, np.uint8, stride * h, pix_off).reshape(h, stride)[:, :w]
        img = palette[idx]
    elif bpp in (24, 32):
        bypp = bpp // 8
        stride = (w * bypp + 3) & ~3
        rows = np.frombuffer(data, np.uint8, stride * h, pix_off).reshape(h, stride)
        px = rows[:, : w * bypp].reshape(h, w, bypp)
        img = px[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    return np.ascontiguousarray(img if top_down else img[::-1])
