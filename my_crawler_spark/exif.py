"""Pure-Python EXIF (APP1/TIFF) metadata: parse, build, and GPS scrub.

Training-data pipelines ingesting crawled images must (a) read orientation /
timestamp / camera metadata for curation and (b) REMOVE location metadata —
EXIF GPS is PII baked into the image container itself. Both run over the
`binary` image column at Arrow-batch granularity (operators/multimodal.py);
this module is the codec underneath, in the same real-format discipline as
`jpeg.py` / `codecs.py` (the container ships no PIL/exiftool — standing
environment constraint; the TIFF 6.0 + EXIF 2.3 wire formats are public).

Scrubbing rewrites ONLY the APP1 segment: the GPS IFD pointer entry and the
GPS IFD bytes are dropped and every other IFD entry — known or unknown,
inline or out-of-line — is re-laid-out verbatim, so camera metadata survives
while the entropy-coded scan (the pixels) is byte-identical.
"""

from __future__ import annotations

import struct

# TIFF type id -> element size in bytes
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004


class _Entry:
    """One IFD entry held as raw value bytes (endian-normalized to big)."""

    __slots__ = ("tag", "type", "count", "value")

    def __init__(self, tag: int, type_: int, count: int, value: bytes):
        self.tag, self.type, self.count, self.value = tag, type_, count, value


def _read_ifd(tiff: bytes, off: int, bo: str) -> list[_Entry]:
    if off + 2 > len(tiff):
        return []
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    entries = []
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            break
        tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, base)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = tiff[base + 8 : base + 8 + size]
        else:
            (ptr,) = struct.unpack_from(bo + "I", tiff, base + 8)
            if ptr + size > len(tiff):
                continue
            raw = tiff[ptr : ptr + size]
        entries.append(_Entry(tag, typ, cnt, _to_be(raw, typ, bo)))
    return entries


def _to_be(raw: bytes, typ: int, bo: str) -> bytes:
    """Normalize a value buffer to big-endian element order."""
    if bo == ">" or _TYPE_SIZE.get(typ, 1) == 1:
        return raw
    es = _TYPE_SIZE[typ]
    step = 4 if typ in (5, 10) else es  # rationals are pairs of LONGs
    out = bytearray()
    for i in range(0, len(raw) - step + 1, step):
        out += raw[i : i + step][::-1]
    return bytes(out)


def _ascii(e: _Entry) -> str | None:
    if e.type != 2:
        return None
    return e.value.split(b"\x00", 1)[0].decode("ascii", "replace")


def _short(e: _Entry, bo: str = ">") -> int | None:
    if e.type == 3 and len(e.value) >= 2:
        return struct.unpack(">H", e.value[:2])[0]
    if e.type == 4 and len(e.value) >= 4:
        return struct.unpack(">I", e.value[:4])[0]
    return None


def _rational3_degrees(e: _Entry) -> float | None:
    """(deg, min, sec) RATIONALs -> decimal degrees."""
    if e.type != 5 or e.count < 3 or len(e.value) < 24:
        return None
    vals = []
    for i in range(3):
        num, den = struct.unpack_from(">II", e.value, i * 8)
        vals.append(num / den if den else 0.0)
    return vals[0] + vals[1] / 60.0 + vals[2] / 3600.0


def _deg_to_rational3(deg: float) -> bytes:
    """Decimal degrees -> (deg, min, sec*10000/10000) RATIONAL triple."""
    d = int(deg)
    m = int((deg - d) * 60)
    s = round(((deg - d) * 60 - m) * 60 * 10000)
    return struct.pack(">IIIIII", d, 1, m, 1, s, 10000)


def find_app1(jpeg: bytes) -> tuple[int, int] | None:
    """(offset, total_len) of the EXIF APP1 segment, or None. Walks the
    segment chain from SOI; stops at SOS (EXIF must precede the scan)."""
    if len(jpeg) < 4 or jpeg[0:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            return None
        marker = jpeg[pos + 1]
        if marker == 0xDA:  # SOS
            return None
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return pos, 2 + seglen
        pos += 2 + seglen
    return None


def _parse_tiff(tiff: bytes) -> tuple[str, list[_Entry], list[_Entry], list[_Entry]]:
    """-> (byte_order, ifd0, exif_ifd, gps_ifd); empty lists when absent."""
    if len(tiff) < 8:
        return ">", [], [], []
    if tiff[0:2] == b"II":
        bo = "<"
    elif tiff[0:2] == b"MM":
        bo = ">"
    else:
        return ">", [], [], []
    (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
    ifd0 = _read_ifd(tiff, ifd0_off, bo)
    exif_ifd: list[_Entry] = []
    gps_ifd: list[_Entry] = []
    for e in ifd0:
        ptr = _short(e)
        if ptr is None:
            continue
        if e.tag == _TAG_EXIF_IFD:
            exif_ifd = _read_ifd(tiff, ptr, bo)
        elif e.tag == _TAG_GPS_IFD:
            gps_ifd = _read_ifd(tiff, ptr, bo)
    return bo, ifd0, exif_ifd, gps_ifd


def parse_exif(jpeg: bytes) -> dict:
    """-> {orientation, datetime, make, model, has_gps, gps_lat, gps_lon}
    (None-valued where absent). Unknown/corrupt EXIF parses to all-None."""
    out = {
        "orientation": None,
        "datetime": None,
        "make": None,
        "model": None,
        "has_gps": False,
        "gps_lat": None,
        "gps_lon": None,
    }
    loc = find_app1(jpeg)
    if loc is None:
        return out
    off, total = loc
    tiff = jpeg[off + 10 : off + total]
    _, ifd0, _, gps = _parse_tiff(tiff)
    for e in ifd0:
        if e.tag == _TAG_ORIENTATION:
            out["orientation"] = _short(e)
        elif e.tag == _TAG_DATETIME:
            out["datetime"] = _ascii(e)
        elif e.tag == _TAG_MAKE:
            out["make"] = _ascii(e)
        elif e.tag == _TAG_MODEL:
            out["model"] = _ascii(e)
    lat = lon = None
    lat_ref = lon_ref = ""
    for e in gps:
        if e.tag == _GPS_LAT:
            lat = _rational3_degrees(e)
        elif e.tag == _GPS_LON:
            lon = _rational3_degrees(e)
        elif e.tag == _GPS_LAT_REF:
            lat_ref = _ascii(e) or ""
        elif e.tag == _GPS_LON_REF:
            lon_ref = _ascii(e) or ""
    if lat is not None or lon is not None:
        out["has_gps"] = True
        if lat is not None:
            out["gps_lat"] = -lat if lat_ref == "S" else lat
        if lon is not None:
            out["gps_lon"] = -lon if lon_ref == "W" else lon
    return out


def _write_ifds(ifds: list[list[_Entry]], links: list[tuple[int, int, int]]) -> bytes:
    """Lay out IFDs big-endian after an 8-byte TIFF header. `links` are
    (src_ifd_idx, entry_tag, dst_ifd_idx) pointer entries to patch."""
    # compute IFD offsets: header(8) then each IFD's table, then data area
    offsets = []
    pos = 8
    for ifd in ifds:
        offsets.append(pos)
        pos += 2 + 12 * len(ifd) + 4
    data = bytearray()
    out = bytearray(b"MM\x00\x2a" + struct.pack(">I", 8 if ifds else 0))
    for idx, ifd in enumerate(ifds):
        out += struct.pack(">H", len(ifd))
        for e in ifd:
            dst = next((d for s, t, d in links if s == idx and t == e.tag), None)
            if dst is not None:
                out += struct.pack(">HHI", e.tag, 4, 1)
                out += struct.pack(">I", offsets[dst])
                continue
            out += struct.pack(">HHI", e.tag, e.type, e.count)
            if len(e.value) <= 4:
                out += e.value.ljust(4, b"\x00")
            else:
                out += struct.pack(">I", pos + len(data))
                data += e.value
        out += struct.pack(">I", 0)  # next-IFD link: none
    return bytes(out) + bytes(data)


def build_exif_app1(
    orientation: int | None = None,
    datetime: str | None = None,
    make: str | None = None,
    model: str | None = None,
    gps: tuple[float, float] | None = None,
) -> bytes:
    """A complete EXIF APP1 segment (marker + length + Exif\\0\\0 + TIFF)."""
    ifd0: list[_Entry] = []
    if make is not None:
        b = make.encode("ascii") + b"\x00"
        ifd0.append(_Entry(_TAG_MAKE, 2, len(b), b))
    if model is not None:
        b = model.encode("ascii") + b"\x00"
        ifd0.append(_Entry(_TAG_MODEL, 2, len(b), b))
    if orientation is not None:
        ifd0.append(_Entry(_TAG_ORIENTATION, 3, 1, struct.pack(">H", orientation)))
    if datetime is not None:
        b = datetime.encode("ascii") + b"\x00"
        ifd0.append(_Entry(_TAG_DATETIME, 2, len(b), b))
    ifds = [ifd0]
    links: list[tuple[int, int, int]] = []
    if gps is not None:
        lat, lon = gps
        gps_ifd = [
            _Entry(_GPS_LAT_REF, 2, 2, (b"S" if lat < 0 else b"N") + b"\x00"),
            _Entry(_GPS_LAT, 5, 3, _deg_to_rational3(abs(lat))),
            _Entry(_GPS_LON_REF, 2, 2, (b"W" if lon < 0 else b"E") + b"\x00"),
            _Entry(_GPS_LON, 5, 3, _deg_to_rational3(abs(lon))),
        ]
        ifd0.append(_Entry(_TAG_GPS_IFD, 4, 1, b"\x00" * 4))
        ifds.append(gps_ifd)
        links.append((0, _TAG_GPS_IFD, 1))
    ifd0.sort(key=lambda e: e.tag)  # TIFF requires ascending tag order
    tiff = _write_ifds(ifds, links)
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 right after SOI (the EXIF-mandated position)."""
    if len(jpeg) < 2 or jpeg[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def strip_gps(jpeg: bytes) -> bytes:
    """Remove ONLY the GPS IFD from the EXIF APP1: the pointer entry and
    the pointed-to IFD vanish; every other entry (any IFD, any tag, known
    or not) is re-laid-out verbatim. Bytes outside the APP1 segment —
    including the entropy-coded pixels — are untouched. A JPEG without
    EXIF GPS round-trips unchanged."""
    loc = find_app1(jpeg)
    if loc is None:
        return jpeg
    off, total = loc
    tiff = jpeg[off + 10 : off + total]
    _, ifd0, exif_ifd, gps = _parse_tiff(tiff)
    if not gps:
        return jpeg
    kept0 = [e for e in ifd0 if e.tag != _TAG_GPS_IFD]
    ifds = [kept0]
    links: list[tuple[int, int, int]] = []
    if exif_ifd:
        ifds.append(exif_ifd)
        links.append((0, _TAG_EXIF_IFD, 1))
    else:
        kept0 = [e for e in kept0 if e.tag != _TAG_EXIF_IFD]
        ifds[0] = kept0
    new_tiff = _write_ifds(ifds, links)
    body = b"Exif\x00\x00" + new_tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return jpeg[:off] + app1 + jpeg[off + total :]
