"""Pure-numpy RIFF/WAVE codec (my_crawler_spark/wav.py) — real bitstreams:
roundtrips across every supported sample format, header-only metadata,
chunk-walk robustness, and rejection of malformed streams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from my_crawler_spark import wav


def _tone(n, dtype):
    x = np.arange(n, dtype=np.int64) * 2654435761 % 65536 - 32768
    if dtype == np.uint8:
        return ((x + 32768) // 256).astype(np.uint8)
    if dtype == np.int16:
        return x.astype(np.int16)
    if dtype == np.int32:
        return (x * 65536).astype(np.int32)
    if dtype == np.float32:
        return (x / 32768.0).astype(np.float32)
    if dtype == np.float64:
        return (x / 32768.0).astype(np.float64)
    raise AssertionError(dtype)


@pytest.mark.parametrize(
    "dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64]
)
def test_roundtrip_exact_every_format(dtype):
    x = _tone(1234, dtype)
    back, rate = wav.decode_wav(wav.encode_wav(x, 16000))
    assert rate == 16000
    assert back.shape == (1234, 1)
    assert back.dtype == x.dtype
    assert np.array_equal(back[:, 0], x)


def test_roundtrip_pcm24_exact_and_sign_extended():
    x = (np.arange(-4000, 4000, 7, dtype=np.int64) * 2048).astype(np.int32)
    assert x.min() < 0
    data = wav.encode_wav(x, 48000, bits=24)
    n, rate, ch, bits, fmt = wav.wav_info(data)
    assert (n, rate, ch, bits, fmt) == (len(x), 48000, 1, 24, wav.WAVE_FORMAT_PCM)
    back, _ = wav.decode_wav(data)
    assert np.array_equal(back[:, 0], x)


def test_pcm24_range_guard():
    with pytest.raises(ValueError):
        wav.encode_wav(np.array([1 << 23], np.int32), 8000, bits=24)


def test_stereo_interleaving_preserved():
    left = np.arange(500, dtype=np.int16)
    st = np.stack([left, -2 * left], axis=1)
    back, _ = wav.decode_wav(wav.encode_wav(st, 44100))
    assert back.shape == (500, 2)
    assert np.array_equal(back, st)


def test_wav_info_is_header_only_and_matches_decode():
    x = _tone(9999, np.int16)
    data = wav.encode_wav(x, 22050)
    n, rate, ch, bits, fmt = wav.wav_info(data)
    assert (n, rate, ch, bits) == (9999, 22050, 1, 16)
    # truncating the payload must not break the header parse (sizes are
    # declared, not derived from len(data))
    n2, *_ = wav.wav_info(data[: 44 + 10])
    assert n2 == 9999


def test_unknown_chunks_skipped_in_declared_order():
    """A LIST chunk between fmt and data (common in in-the-wild WAVs) and an
    odd-sized chunk with its pad byte must both be walked over."""
    x = _tone(100, np.int16)
    base = wav.encode_wav(x, 8000)
    fmt_chunk = base[12 : 12 + 8 + 16]
    data_chunk = base[12 + 8 + 16 :]
    junk_odd = b"cue " + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    junk_list = b"LIST" + struct.pack("<I", 10) + b"INFOxxxxxx"
    body = fmt_chunk + junk_odd + junk_list + data_chunk
    stitched = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    back, rate = wav.decode_wav(stitched)
    assert rate == 8000
    assert np.array_equal(back[:, 0], x)


def test_extensible_wrapper_resolves_subformat():
    x = _tone(64, np.int16)
    base = wav.encode_wav(x, 8000)
    # rewrite the 16-byte PCM fmt as a 40-byte EXTENSIBLE one
    fmt_body = base[20 : 20 + 16]
    ext = (
        fmt_body[:0]
        + struct.pack("<H", wav.WAVE_FORMAT_EXTENSIBLE)
        + fmt_body[2:16]
        + struct.pack("<HHI", 22, 16, 0x1)
        + struct.pack("<H", wav.WAVE_FORMAT_PCM)
        + wav._EXT_GUID_TAIL
    )
    body = b"fmt " + struct.pack("<I", len(ext)) + ext + base[12 + 8 + 16 :]
    stitched = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    n, rate, ch, bits, fmt = wav.wav_info(stitched)
    assert fmt == wav.WAVE_FORMAT_PCM and bits == 16
    back, _ = wav.decode_wav(stitched)
    assert np.array_equal(back[:, 0], x)


def test_rejects_non_wave():
    with pytest.raises(ValueError):
        wav.decode_wav(b"RIFF\x00\x00\x00\x00AVI stuff")
    with pytest.raises(ValueError):
        wav.decode_wav(b"not even riff")


def test_missing_data_chunk_rejected():
    x = _tone(10, np.int16)
    base = wav.encode_wav(x, 8000)
    headless = base[: 12 + 8 + 16]  # RIFF + fmt only
    with pytest.raises(ValueError):
        wav.decode_wav(headless)
