import pyspark.sql.functions as F

from my_crawler_spark.functions.warc import build_warc_record, parse_warc_files


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
    recs = docs.select(
        (F.col("doc_id") % 2).alias("bucket"),
        F.col("doc_id"),
        build_warc_record(
            F.concat(F.lit("doc:"), F.col("doc_id").cast("string")), F.col("text")
        ).alias("rec"),
    )
    files = recs.groupBy("bucket").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "rec"))),
                lambda s: s["rec"],
            ),
            "",
        ).alias("content")
    )
    parsed = {r["uri"]: r.asDict() for r in parse_warc_files(files).collect()}
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(parsed) == {f"doc:{i}" for i in rows}
    for i, text in rows.items():
        p = parsed[f"doc:{i}"]
        assert p["payload"] == text, i                      # lossless, framing-proof
        assert p["content_length"] == len(text.encode("utf-8")), i
        assert p["record_id"].startswith("<urn:sha256:")


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
    assert len(got) == 1 and got[0]["uri"] == "a" and got[0]["payload"] == "hi"
