"""Structured Streaming layer: request admission, stateful politeness,
windowed metrics — run with availableNow triggers on file/memory sources."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from my_crawler_spark.streaming.stream_crawl import (
    admit_request_stream,
    metrics_window_stream,
    politeness_token_stream,
)


def _run_available_now(q_writer, name):
    q = q_writer.trigger(availableNow=True).format("memory").queryName(name).start()
    q.awaitTermination(120)
    return q


def test_admit_request_stream(spark, tmp_path):
    reqs = tmp_path / "reqs"
    reqs.mkdir()
    rows = [
        {"request_id": 1, "url": "https://A.com/x?q=1#f", "max_pages": 5,
         "max_depth": 2, "same_domain": True, "enqueued_at": "2026-01-01T00:00:00"},
        {"request_id": 2, "url": "https://a.com/login", "max_pages": 5,
         "max_depth": 2, "same_domain": True, "enqueued_at": "2026-01-01T00:00:01"},
        {"request_id": 3, "url": "ftp://nope/x", "max_pages": 5,
         "max_depth": 2, "same_domain": True, "enqueued_at": "2026-01-01T00:00:02"},
    ]
    (reqs / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = admit_request_stream(spark, str(reqs))
    assert stream.isStreaming
    _run_available_now(stream.writeStream, "admitted")
    got = spark.sql("SELECT * FROM admitted").collect()
    assert len(got) == 1  # trap and non-http rejected (crawl_loop.rs:61-69)
    assert got[0].url == "https://a.com/x"
    assert got[0].host == "a.com"


def test_politeness_token_stream(spark, tmp_path):
    src = tmp_path / "urls"
    src.mkdir()
    rows = [
        {"host": "a.com", "url": f"https://a.com/{i}", "event_ts": float(i)}
        for i in range(6)
    ] + [{"host": "b.com", "url": "https://b.com/0", "event_ts": 0.0}]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    urls = spark.readStream.schema("host string, url string, event_ts double").json(str(src))
    out = politeness_token_stream(urls, interval_s=2.0, burst=3)
    _run_available_now(out.writeStream, "admitted_urls")
    got = spark.sql("SELECT * FROM admitted_urls").collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r.url)
    # bucket: burst 3 + elapsed 5s / 2s = 2 refill -> at most 3 admitted
    # in the first batch for a.com (tokens capped at burst), rest deferred
    assert len(by_host["a.com"]) <= 3
    assert by_host["a.com"] == [f"https://a.com/{i}" for i in range(len(by_host["a.com"]))]
    assert by_host["b.com"] == ["https://b.com/0"]
    deferred = {r.deferred_in_state for r in got if r.host == "a.com"}
    assert deferred == {6 - len(by_host["a.com"])}


def test_metrics_window_stream(spark, tmp_path):
    src = tmp_path / "visits"
    src.mkdir()
    rows = [
        {"ts": "2026-01-01T00:00:05", "outcome": "crawled"},
        {"ts": "2026-01-01T00:00:20", "outcome": "crawled"},
        {"ts": "2026-01-01T00:01:10", "outcome": "failed"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    visits = spark.readStream.schema("ts timestamp, outcome string").json(str(src))
    out = metrics_window_stream(visits)
    q = (
        out.writeStream.outputMode("complete")
        .trigger(availableNow=True)
        .format("memory")
        .queryName("live_metrics")
        .start()
    )
    q.awaitTermination(120)
    got = {(str(r.window_start), r.outcome): r.n for r in spark.sql("SELECT * FROM live_metrics").collect()}
    assert got[("2026-01-01 00:00:00", "crawled")] == 2
    assert got[("2026-01-01 00:01:00", "failed")] == 1


def test_fetch_extract_stream_matches_batch_and_is_idempotent(spark, fixtures, tmp_path):
    """The streamed S1+E1 vertical must produce EXACTLY the chunks the batch
    operators produce on the same admitted rows, and replaying the same
    input through a fresh stream must leave the sink unchanged (the
    (source_url, page_version)-keyed upsert is idempotent)."""
    import json as _json

    from my_crawler_spark.operators.extract import explode_chunks, extract_pages
    from my_crawler_spark.operators.fetch import fetch_join, max_redirect_hops
    from my_crawler_spark.plans.crawl_plan import CHUNKS_SCHEMA
    from my_crawler_spark.sources.lake import Catalog
    from my_crawler_spark.streaming.stream_crawl import fetch_extract_stream

    pages = spark.createDataFrame(fixtures["pages"])
    redirects = spark.createDataFrame(fixtures["redirects"])
    images = spark.createDataFrame(fixtures["images"])
    hops = max_redirect_hops(pages, redirects)

    urls = fixtures["pages"]["url"].tolist()[:40]
    rows = [
        {"request_id": 1, "seq": i + 1, "url": u, "depth": 0, "use_browser": False}
        for i, u in enumerate(urls)
    ]
    src = tmp_path / "admitted"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows))
    schema = "request_id long, seq long, url string, depth int, use_browser boolean"

    cat = Catalog(spark, str(tmp_path / "lake"))
    t_chunks = cat.table("chunks", CHUNKS_SCHEMA)
    admitted = spark.readStream.schema(schema).json(str(src))
    q = (
        fetch_extract_stream(admitted, pages, redirects, images, t_chunks,
                             max_hops=hops)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    q.awaitTermination(180)

    batch = spark.createDataFrame([tuple(r.values()) for r in rows], schema)
    expected = explode_chunks(
        extract_pages(
            fetch_join(batch, pages, redirects, max_hops=hops)
            .filter(F.col("fetch_kind") == "ok")
            .select("request_id", "seq", "final_url", "image_id"),
            images,
        ).select("request_id", "seq", "chunks")
    ).select(*[f.name for f in CHUNKS_SCHEMA])

    key = ["point_id", "page_version", "chunk_index", "source_url"]
    got = sorted(tuple(r) for r in t_chunks.read().select(*key).collect())
    want = sorted(tuple(r) for r in expected.select(*key).collect())
    assert len(want) > 0
    assert got == want

    # replay: same input, fresh stream + checkpoint -> sink unchanged
    admitted2 = spark.readStream.schema(schema).json(str(src))
    q2 = (
        fetch_extract_stream(admitted2, pages, redirects, images, t_chunks,
                             max_hops=hops)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q2.awaitTermination(180)
    got2 = sorted(tuple(r) for r in t_chunks.read().select(*key).collect())
    assert got2 == want


def test_curation_stream_cross_batch_dedup_and_idempotence(spark, tmp_path):
    """Two micro-batches with overlapping + within-batch duplicate docs:
    each unique passing doc lands in the curated table exactly once (the
    seen-hash anti-join dedups ACROSS batches); low-quality docs are
    gated; replaying both batches through a fresh stream leaves the
    curated table unchanged."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from my_crawler_spark.sources.lake import Catalog
    from my_crawler_spark.streaming.stream_crawl import curation_stream

    good1 = "the data engine scans the table and it is a good long document " * 4
    good2 = "der schnelle braune fuchs und die katze ist auf den tisch heute " * 4
    bad = "!!! ??? ### $$$ %%%"  # punctuation-heavy -> quality gate
    b1 = [
        {"doc_id": 1, "text": good1},
        {"doc_id": 2, "text": good1},  # within-batch dup of 1
        {"doc_id": 3, "text": bad},
    ]
    b2 = [
        {"doc_id": 4, "text": good1},  # cross-batch dup of 1
        {"doc_id": 5, "text": good2},
    ]
    src = tmp_path / "docs"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))

    cat = Catalog(spark, str(tmp_path / "lake"))
    curated_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("quality", DoubleType()),
        ]
    )
    seen_schema = StructType([StructField("text_hash", StringType())])
    t_curated = cat.table("curated", curated_schema)
    t_seen = cat.table("seen_hashes", seen_schema)

    def run(ck):
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).json(str(src))
        q = (
            curation_stream(stream, t_curated, t_seen)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / ck))
            .start()
        )
        q.awaitTermination(180)

    run("ck1")
    got = {(r.doc_id, r.lang) for r in t_curated.read().collect()}
    assert got == {(1, "en"), (5, "de")}, got
    # replay: fresh stream over the same files -> no new rows
    run("ck2")
    assert t_curated.read().count() == 2
    assert t_seen.read().count() == 2


def test_image_pair_stream_cross_batch_phash_dedup(spark, tmp_path):
    """Image-axis streamed ingest: decode gate drops broken bytes, caption
    gate drops stubs, identical pixels dedup within AND across batches via
    the seen-phash table, and replaying the stream is a no-op."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from my_crawler_spark import codecs as C
    from my_crawler_spark.fixtures import make_pixels
    from my_crawler_spark.sources.lake import Catalog
    from my_crawler_spark.streaming.stream_crawl import image_pair_stream

    png_a = C.encode_image(make_pixels(7, 1, 16, 16), "png")
    png_b = C.encode_image(make_pixels(7, 2, 16, 16), "png")
    b1 = [
        ("i1", png_a, "a clear photo of a fox"),
        ("i2", png_a, "same pixels, different id"),  # within-batch dup of i1
        ("i3", b"\x00notapng", "broken bytes row"),
        ("i4", png_b, "x"),  # caption too short
    ]
    b2 = [
        ("i5", png_a, "cross-batch duplicate of i1"),
        ("i6", png_b, "a second distinct image with caption"),
    ]
    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("caption", StringType()),
        ]
    )
    src = tmp_path / "imgs"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))

    cat = Catalog(spark, str(tmp_path / "lake"))
    curated_schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("phash", LongType()),
            StructField("w", LongType()),
            StructField("h", LongType()),
            StructField("caption", StringType()),
        ]
    )
    t_curated = cat.table("curated_imgs", curated_schema)
    t_seen = cat.table("seen_phashes", StructType([StructField("phash", LongType())]))

    def run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        q = (
            image_pair_stream(stream, t_curated, t_seen)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / ck))
            .start()
        )
        q.awaitTermination(180)

    run("ck1")
    got = {r.image_id for r in t_curated.read().collect()}
    assert got == {"i1", "i6"}, got
    run("ck2")
    assert t_curated.read().count() == 2
    assert t_seen.read().count() == 2
