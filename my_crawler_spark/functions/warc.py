"""WARC (ISO 28500) record writer/reader — the crawl interchange format.

A production crawler both EMITS WARC (so archives/downstream tools can read
its captures) and INGESTS it (Common Crawl dumps are the standard 100 TB
corpus source). Two halves:

- build_warc_record: a pure-JVM string expression assembling a WARC/1.0
  response record per row (headers + payload). Content-Length is OCTETS
  (octet_length, not char length — CJK payloads are the regression that
  catches char-based writers).
- parse_warc_files: an Arrow-batched mapInPandas reader over concatenated
  record streams ("files"). It walks records byte-accurately: header block
  to the first CRLFCRLF, Content-Length octets of payload, CRLFCRLF record
  separator — the spec's framing, so payloads containing "WARC/1.0" or
  blank lines cannot confuse it (a split-on-delimiter reader would).

At scale the files column is one blob per (path-ish) group; parsing is
embarrassingly parallel per file with zero shuffle. The entry's oracle
closes the loop: parse(concat(build(docs))) must hash-match fields
recomputed directly from the source table — a lossless round trip.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = "\r\n"


def build_warc_record(uri, payload) -> F.Column:
    """One WARC/1.0 response record as a string column. Record-ID derives
    from sha256(uri) — deterministic, so re-crawls of the same capture
    produce byte-identical records."""
    return F.concat(
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
        payload,
        F.lit(_CRLF + _CRLF),
    )


PARSED_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("record_id", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", StringType()),
    ]
)


def parse_warc_files(files: DataFrame, content_col: str = "content") -> DataFrame:
    """Parse concatenated WARC record streams into one row per record.

    Byte-accurate framing: headers up to CRLFCRLF, exactly Content-Length
    payload octets, CRLFCRLF separator. Malformed trailing garbage ends the
    file's parse (records before it are still emitted) — the forgiving
    behavior archive readers need."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"uri": [], "record_id": [], "content_length": [], "payload": []}
            for content in pdf[content_col]:
                if content is None:
                    continue
                data = content.encode("utf-8")
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
                    out["payload"].append(body.decode("utf-8"))
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
