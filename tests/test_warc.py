import gzip

import pyspark.sql.functions as F

from my_crawler_spark.functions.warc import (
    build_warc_record,
    gzip_records,
    parse_warc_files,
)


def _files_from_docs(docs, gzip_members=False):
    rec = build_warc_record(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")),
        F.encode(F.col("text"), "UTF-8"),
    )
    if gzip_members:
        rec = gzip_records(rec)
    recs = docs.select(
        (F.col("doc_id") % 2).alias("bucket"), F.col("doc_id"), rec.alias("rec")
    )
    return recs.groupBy("bucket").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "rec"))),
                lambda s: s["rec"],
            ),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ).alias("content")
    )


def test_warc_roundtrip_including_adversarial_payloads(spark):
    docs = spark.createDataFrame(
        [
            (1, "plain ascii body"),
            (2, "中文 payload 字节数 != 字符数"),             # CJK: octets != chars
            (3, "body containing\r\n\r\nWARC/1.0\r\nfake header"),  # framing bait
            (4, ""),                                          # empty payload
        ],
        "doc_id long, text string",
    )
    parsed = {
        r["uri"]: r.asDict()
        for r in parse_warc_files(_files_from_docs(docs)).collect()
    }
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(parsed) == {f"doc:{i}" for i in rows}
    for i, text in rows.items():
        p = parsed[f"doc:{i}"]
        assert bytes(p["payload"]) == text.encode("utf-8"), i  # lossless
        assert p["content_length"] == len(text.encode("utf-8")), i
        assert p["record_id"].startswith("<urn:sha256:")


def test_warc_binary_payloads_survive_roundtrip(spark):
    """Real captures are raw octets: payloads that are NOT valid UTF-8
    (0xFF/0x00 runs, truncated multibyte sequences, the gzip magic itself)
    must round-trip byte-identically through build -> concat -> parse."""
    payloads = {
        1: bytes([0xFF, 0x00, 0x9C, 0x1F, 0x8B, 0x08]) * 7,  # gzip magic inside
        2: bytes(range(256)),
        3: "中文".encode("utf-16-le"),                        # invalid as UTF-8
        4: b"\r\n\r\nWARC/1.0\r\n" + bytes([0x80, 0xFE]),    # framing bait + junk
    }
    docs = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()], "doc_id long, body binary"
    )
    recs = docs.select(
        F.lit(0).alias("bucket"),
        F.col("doc_id"),
        build_warc_record(
            F.concat(F.lit("doc:"), F.col("doc_id").cast("string")), F.col("body")
        ).alias("rec"),
    )
    files = recs.groupBy("bucket").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "rec"))),
                lambda s: s["rec"],
            ),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ).alias("content")
    )
    parsed = {r["uri"]: bytes(r["payload"]) for r in parse_warc_files(files).collect()}
    assert parsed == {f"doc:{k}": v for k, v in payloads.items()}


def test_warc_gzip_members_roundtrip(spark):
    """Common Crawl layout: each record its own gzip member, members
    concatenated per file. The parser auto-detects and the member bytes are
    deterministic (mtime=0)."""
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "中文 body"), (3, "")], "doc_id long, text string"
    )
    files = _files_from_docs(docs, gzip_members=True)
    blob = bytes(files.collect()[0]["content"])
    assert blob.startswith(b"\x1f\x8b")
    # deterministic bytes: re-gzipping the first record reproduces the head
    first = gzip.compress(
        gzip.decompress(blob[: _member_len(blob)]), mtime=0
    )
    assert blob[: len(first)] == first
    parsed = {
        r["uri"]: bytes(r["payload"]) for r in parse_warc_files(files).collect()
    }
    assert parsed == {
        "doc:1": b"alpha", "doc:2": "中文 body".encode("utf-8"), "doc:3": b""
    }


def _member_len(blob: bytes) -> int:
    import zlib

    d = zlib.decompressobj(wbits=31)
    d.decompress(blob)
    return len(blob) - len(d.unused_data)


def test_warc_parser_is_forgiving_on_truncation(spark):
    files = spark.createDataFrame(
        [
            (
                "WARC/1.0\r\nWARC-Target-URI: a\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
                "WARC/1.0\r\nWARC-Target-URI: b\r\nContent-Length: 99\r\n\r\ntruncated",
            )
        ],
        "content string",
    )
    got = parse_warc_files(files).collect()
    assert len(got) == 1 and got[0]["uri"] == "a" and bytes(got[0]["payload"]) == b"hi"
