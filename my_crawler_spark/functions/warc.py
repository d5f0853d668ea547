"""WARC (ISO 28500) record writer/reader — the crawl interchange format.

A production crawler both EMITS WARC (so archives/downstream tools can read
its captures) and INGESTS it (Common Crawl dumps are the standard 100 TB
corpus source). Two halves:

- build_warc_record: a pure-JVM expression assembling a WARC/1.0 response
  record per row (headers + payload) as a BINARY column — real captures
  are raw octets (images, gzip bodies, broken encodings), not UTF-8
  strings. Content-Length is OCTETS of the binary payload (CJK and
  non-UTF-8 payloads are the regressions that catch char-based writers).
- gzip_records: optional per-member gzip (mtime pinned to 0 so records are
  byte-deterministic) — Common Crawl's layout, one gzip member per record,
  members concatenated per file.
- parse_warc_files: an Arrow-batched mapInPandas reader over concatenated
  record streams ("files"), plain or gzip-membered (auto-detected by
  magic). It walks records byte-accurately: header block to the first
  CRLFCRLF, Content-Length octets of payload, CRLFCRLF record separator —
  the spec's framing, so payloads containing "WARC/1.0" or blank lines
  cannot confuse it (a split-on-delimiter reader would).

At scale the files column is one blob per (path-ish) group; parsing is
embarrassingly parallel per file with zero shuffle. The entry's oracle
closes the loop: parse(concat(build(docs))) must hash-match fields
recomputed directly from the source table — a lossless round trip.
"""

from __future__ import annotations

import gzip as _gzip
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = "\r\n"


def build_warc_record(uri, payload) -> F.Column:
    """One WARC/1.0 response record as a BINARY column. `payload` must be a
    binary column (encode string bodies with F.encode(col, 'UTF-8')).
    Record-ID derives from sha256(uri) — deterministic, so re-crawls of the
    same capture produce byte-identical records."""
    headers = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.concat(F.lit("WARC-Target-URI: "), uri, F.lit(_CRLF)),
        F.concat(
            F.lit("WARC-Record-ID: <urn:sha256:"),
            F.substring(F.sha2(uri, 256), 1, 32),
            F.lit(">" + _CRLF),
        ),
        F.concat(
            F.lit("Content-Length: "),
            F.octet_length(payload).cast("string"),
            F.lit(_CRLF),
        ),
        F.lit(_CRLF),
    )
    return F.concat(
        F.encode(headers, "UTF-8"), payload, F.encode(F.lit(_CRLF + _CRLF), "UTF-8")
    )


@F.pandas_udf(BinaryType())
def gzip_records(recs: pd.Series) -> pd.Series:
    """Each record compressed as its own gzip member (mtime=0: deterministic
    bytes). Concatenated members form a valid multi-member gzip stream —
    Common Crawl's WARC layout, which lets a reader seek to a record
    without decompressing the whole file."""
    return recs.map(
        lambda b: None if b is None else _gzip.compress(bytes(b), mtime=0)
    )


PARSED_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("record_id", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
    ]
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenated multi-member gzip stream. Trailing garbage
    after the last complete member is dropped (the same forgiving posture
    as the record parser)."""
    out = []
    while data.startswith(_GZIP_MAGIC):
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
        except zlib.error:
            break
        if not d.eof:
            break
        data = d.unused_data
    return b"".join(out)


def parse_warc_files(files: DataFrame, content_col: str = "content") -> DataFrame:
    """Parse concatenated WARC record streams into one row per record.

    `content` may be binary (raw or gzip-membered, auto-detected) or
    string (legacy UTF-8 streams). Byte-accurate framing: headers up to
    CRLFCRLF, exactly Content-Length payload octets, CRLFCRLF separator.
    Malformed trailing garbage ends the file's parse (records before it
    are still emitted) — the forgiving behavior archive readers need."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"uri": [], "record_id": [], "content_length": [], "payload": []}
            for content in pdf[content_col]:
                if content is None:
                    continue
                data = (
                    content.encode("utf-8")
                    if isinstance(content, str)
                    else bytes(content)
                )
                if data.startswith(_GZIP_MAGIC):
                    data = _gunzip_members(data)
                pos = 0
                while True:
                    if not data[pos:].startswith(b"WARC/1.0\r\n"):
                        break
                    hdr_end = data.find(b"\r\n\r\n", pos)
                    if hdr_end < 0:
                        break
                    headers = {}
                    for line in data[pos:hdr_end].decode("utf-8").split(_CRLF)[1:]:
                        k, _, v = line.partition(":")
                        headers[k.strip().lower()] = v.strip()
                    try:
                        n = int(headers["content-length"])
                    except (KeyError, ValueError):
                        break
                    body_start = hdr_end + 4
                    body = data[body_start : body_start + n]
                    if len(body) < n or data[body_start + n : body_start + n + 4] != b"\r\n\r\n":
                        break
                    out["uri"].append(headers.get("warc-target-uri"))
                    out["record_id"].append(headers.get("warc-record-id"))
                    out["content_length"].append(n)
                    out["payload"].append(body)
                    pos = body_start + n + 4
            yield pd.DataFrame(
                {
                    "uri": out["uri"],
                    "record_id": out["record_id"],
                    "content_length": pd.array(out["content_length"], dtype="Int64"),
                    "payload": out["payload"],
                }
            )

    return files.mapInPandas(_parse, PARSED_SCHEMA)
