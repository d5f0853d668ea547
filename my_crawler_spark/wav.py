"""Pure-numpy RIFF/WAVE codec — REAL PCM/IEEE-float bitstreams.

Closes the round-4 "audio decode env-gated" gap without codec libs: WAV is
RIFF chunk framing + raw little-endian sample words, so a from-scratch
decoder is struct parsing + ``np.frombuffer`` — no per-sample Python.
The reference has no audio code at all (the crawler is HTML/text —
`spider/src/web_visitor.rs` rejects non-text content types); audio support
here belongs to the beyond-reference training-data-pipeline suite, feeding
`operators/multimodal.py::segment_audio` / ``audio_segment_energy`` with
real containers instead of the deterministic fake.

Wire formats supported (decode): PCM 8-bit (offset-binary), 16/24/32-bit
signed LE, IEEE float32/float64, and WAVE_FORMAT_EXTENSIBLE wrappers of
any of those; arbitrary chunk order with unknown chunks (LIST/fact/cue)
skipped via their declared sizes, including the odd-size pad byte rule
(RIFF chunks are word-aligned).

Encode emits the canonical minimal layout (RIFF/WAVE + fmt + data) from a
numpy array whose dtype picks the format: uint8 -> PCM8, int16 -> PCM16,
int32 -> PCM32 (or PCM24 with ``bits=24``), float32 -> IEEE float.
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_EXTENSIBLE = 0xFFFE

# The 14 GUID tail bytes shared by every registered KSDATAFORMAT_SUBTYPE_*;
# the leading u16 is the classic format tag (MSDN: mmreg.h).
_EXT_GUID_TAIL = bytes.fromhex("000000001000800000aa00389b71")


def _dtype_format(samples: np.ndarray, bits: int | None) -> tuple[int, int]:
    """-> (format_tag, bits_per_sample) for the encoder."""
    if samples.dtype == np.uint8:
        return WAVE_FORMAT_PCM, 8
    if samples.dtype == np.int16:
        return WAVE_FORMAT_PCM, 16
    if samples.dtype == np.int32:
        if bits == 24:
            return WAVE_FORMAT_PCM, 24
        return WAVE_FORMAT_PCM, 32
    if samples.dtype == np.float32:
        return WAVE_FORMAT_IEEE_FLOAT, 32
    if samples.dtype == np.float64:
        return WAVE_FORMAT_IEEE_FLOAT, 64
    raise ValueError(f"unsupported sample dtype {samples.dtype}")


def encode_wav(samples: np.ndarray, rate: int, bits: int | None = None) -> bytes:
    """(n,) or (n, channels) array -> minimal RIFF/WAVE bytes.

    ``bits=24`` packs int32 input (values must fit in 24 bits signed) as
    3-byte PCM24 words — the common pro-audio interchange width.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    fmt_tag, nbits = _dtype_format(samples, bits)
    n, ch = samples.shape
    if fmt_tag == WAVE_FORMAT_PCM and nbits == 24:
        lo = np.asarray(samples, np.int32)
        if lo.size and (lo.max(initial=0) > 0x7FFFFF or lo.min(initial=0) < -0x800000):
            raise ValueError("bits=24 requires samples within signed 24-bit range")
        # interleave channels row-major, then emit the low 3 LE bytes of each
        flat = lo.reshape(-1).astype("<i4")
        raw = flat.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    else:
        flat = np.ascontiguousarray(samples).astype(samples.dtype.newbyteorder("<"))
        raw = flat.tobytes()
    block_align = ch * (nbits // 8)
    fmt_body = struct.pack(
        "<HHIIHH", fmt_tag, ch, rate, rate * block_align, block_align, nbits
    )
    chunks = b"".join(
        tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
        for tag, body in ((b"fmt ", fmt_body), (b"data", raw))
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _walk_chunks(data: bytes):
    """Yield (fourcc, start, size) for every top-level chunk after WAVE."""
    pos = 12
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _parse_fmt(body: bytes) -> tuple[int, int, int, int]:
    """fmt chunk body -> (format_tag, channels, rate, bits), resolving
    WAVE_FORMAT_EXTENSIBLE to its subformat tag."""
    fmt_tag, ch, rate, _brate, _align, nbits = struct.unpack_from("<HHIIHH", body, 0)
    if fmt_tag == WAVE_FORMAT_EXTENSIBLE:
        (cb,) = struct.unpack_from("<H", body, 16)
        if cb < 22 or len(body) < 40:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (fmt_tag,) = struct.unpack_from("<H", body, 24)
        if body[26:40] != _EXT_GUID_TAIL:
            raise ValueError("unknown extensible subformat GUID")
    return fmt_tag, ch, rate, nbits


def wav_info(data: bytes) -> tuple[int, int, int, int, int]:
    """Header-only parse -> (n_samples, rate, channels, bits, format_tag).

    Reads the fmt chunk and the data chunk's declared SIZE only — no sample
    conversion — so per-row metadata extraction (duration, rate) over a
    binary column stays O(header) regardless of payload size.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    data_size = None
    for tag, start, size in _walk_chunks(data):
        if tag == b"fmt " and fmt is None:
            fmt = _parse_fmt(data[start : start + size])
        elif tag == b"data" and data_size is None:
            data_size = size
    if fmt is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    fmt_tag, ch, rate, nbits = fmt
    block = ch * (nbits // 8)
    return data_size // block, rate, ch, nbits, fmt_tag


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> ((n, channels) sample array, rate).

    dtype mirrors the wire format: PCM8 -> uint8 (offset-binary, as stored),
    PCM16 -> int16, PCM24/32 -> int32 (24-bit sign-extended), float -> f32/f64.
    Whole-buffer ``np.frombuffer`` views — no per-sample Python loop.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    payload = None
    for tag, start, size in _walk_chunks(data):
        if tag == b"fmt " and fmt is None:
            fmt = _parse_fmt(data[start : start + size])
        elif tag == b"data" and payload is None:
            payload = data[start : start + size]
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    fmt_tag, ch, rate, nbits = fmt
    if fmt_tag == WAVE_FORMAT_PCM:
        if nbits == 8:
            flat = np.frombuffer(payload, np.uint8)
        elif nbits == 16:
            flat = np.frombuffer(payload, "<i2")
        elif nbits == 24:
            tri = np.frombuffer(payload, np.uint8)
            tri = tri[: len(tri) - len(tri) % 3].reshape(-1, 3).astype(np.int32)
            flat = tri[:, 0] | (tri[:, 1] << 8) | ((tri[:, 2].astype(np.int8).astype(np.int32)) << 16)
        elif nbits == 32:
            flat = np.frombuffer(payload, "<i4")
        else:
            raise ValueError(f"unsupported PCM width {nbits}")
    elif fmt_tag == WAVE_FORMAT_IEEE_FLOAT:
        if nbits == 32:
            flat = np.frombuffer(payload, "<f4")
        elif nbits == 64:
            flat = np.frombuffer(payload, "<f8")
        else:
            raise ValueError(f"unsupported float width {nbits}")
    else:
        raise ValueError(f"unsupported format tag {fmt_tag:#x}")
    n = len(flat) - len(flat) % ch
    return flat[:n].reshape(-1, ch), rate
