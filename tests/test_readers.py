"""Readers + request-side helpers (S6, S11, F8, F9, F11, Q10, R4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_crawler_spark.functions.text import needs_browser
from my_crawler_spark.operators.search import get_page, prepare_search_query
from my_crawler_spark.sources.readers import (
    read_domain_ranks,
    read_seed_list,
    resume_anti_join,
    seed_skip_filter,
    skip_reason_histogram,
)


def test_read_seed_list(spark, tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("https://a.com/\n\n# comment\n  https://b.com/x  \n")
    got = [r.url for r in read_seed_list(spark, str(p)).collect()]
    assert got == ["https://a.com/", "https://b.com/x"]


def test_seed_skip_filter(spark):
    seeds = spark.createDataFrame(
        [("https://ads.tracker.com/x",), ("https://ok.com/login",),
         ("ftp://ok.com/x",), ("https://ok.com/page",)],
        ["url"],
    )
    out = seed_skip_filter(seeds, skip_domains=["tracker.com"]).collect()
    got = {r.url: r.skip_reason for r in out}
    assert got["https://ads.tracker.com/x"] == "domain"
    assert got["https://ok.com/login"] == "pattern"
    assert got["ftp://ok.com/x"] == "scheme"
    assert got["https://ok.com/page"] is None
    hist = {r.reason: r.n for r in skip_reason_histogram(
        seed_skip_filter(seeds, skip_domains=["tracker.com"])).collect()}
    assert hist == {"domain": 1, "pattern": 1, "scheme": 1, "kept": 1}


def test_read_domain_ranks(spark, tmp_path):
    p = tmp_path / "tranco.csv"
    p.write_text("1,Example.COM.\n2,www.other.org\n,bad\n")
    got = {r.domain: r.rank for r in read_domain_ranks(spark, str(p)).collect()}
    assert got == {"example.com": 1, "other.org": 2}


def test_resume_anti_join(spark):
    seeds = spark.createDataFrame([("a",), ("b",), ("c",)], ["url"])
    progress = spark.createDataFrame([("b",)], ["url"])
    got = {r.url for r in resume_anti_join(seeds, progress).collect()}
    assert got == {"a", "c"}


def test_prepare_search_query():
    p = prepare_search_query("  hello   world ", limit=100, offset=500)
    assert p == {"query": "hello world", "limit": 50, "offset": 200,
                 "candidate_limit": 1000}
    assert prepare_search_query("   ", 10, 0) is None


def test_get_page(spark):
    chunks = spark.createDataFrame(
        [("https://a/x", 1), ("https://a/x", 0), ("https://a/y", 0)],
        ["source_url", "chunk_index"],
    )
    got = [r.chunk_index for r in get_page(chunks, "https://a/x").collect()]
    assert got == [0, 1]


def test_needs_browser():
    assert needs_browser("")
    assert needs_browser('<div id="app"></div>')
    assert not needs_browser('<div id="app"><p>content</p></div>')
    assert not needs_browser("<html><p>hello</p></html>")
    assert needs_browser('<script>__NEXT_DATA__ = {}</script>')


def test_sitemap_xml_gzip_parse_and_caps(spark):
    """functions/sitemap.py (sitemap.rs:88-99): gzip-sniffed XML parsing of
    urlset + sitemapindex feeding the existing BFS — lastmod-desc ordering
    and the depth-3 cap must hold end-to-end from raw bytes."""
    import gzip
    from types import SimpleNamespace

    from my_crawler_spark.functions import sitemap as SM
    from my_crawler_spark.plans.crawl_plan import CrawlRunner

    origin = "https://h0.example.com"
    NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

    def urlset(entries):
        items = "".join(
            f"<url><loc>{l}</loc>" + (f"<lastmod>{m}</lastmod>" if m else "") + "</url>"
            for l, m in entries
        )
        return f'<?xml version="1.0"?><urlset xmlns="{NS}">{items}</urlset>'.encode()

    def index(entries):
        items = "".join(
            f"<sitemap><loc>{l}</loc><lastmod>{m}</lastmod></sitemap>"
            for l, m in entries
        )
        return f'<?xml version="1.0"?><sitemapindex xmlns="{NS}">{items}</sitemapindex>'.encode()

    raw = [
        # gzipped index: two leaf sitemaps (sm-a newer) + a deep index chain
        (f"{origin}/sitemap.xml", gzip.compress(index([
            (f"{origin}/sm-a.xml", "2026-03-05"),
            (f"{origin}/sm-b.xml", "2026-03-01"),
            (f"{origin}/d1.xml", "2026-01-01"),
        ]))),
        (f"{origin}/sm-a.xml", urlset(
            [(f"{origin}/a{i}", f"2026-01-{i + 1:02d}") for i in range(5)]
        )),
        # gzipped leaf with no lastmods (NaT sorts last, stable)
        (f"{origin}/sm-b.xml", gzip.compress(urlset(
            [(f"{origin}/b{i}", None) for i in range(3)]
        ))),
        # depth chain: d1 -> d2 -> d3 -> d4; d4 sits at depth 4 > cap 3
        (f"{origin}/d1.xml", index([(f"{origin}/d2.xml", "2026-01-01")])),
        (f"{origin}/d2.xml", index([(f"{origin}/d3.xml", "2026-01-01")])),
        (f"{origin}/d3.xml", index([(f"{origin}/d4.xml", "2026-01-01")])),
        (f"{origin}/d4.xml", urlset([(f"{origin}/deep", "2026-01-01")])),
        (f"{origin}/bad.xml", b"<not-xml"),
        (f"{origin}/trunc.gz", b"\x1f\x8b\x00broken"),
    ]
    dim = SM.sitemaps_dim_from_bytes(spark, raw)
    assert len(dim[dim.sitemap_url == f"{origin}/sm-a.xml"]) == 5
    assert len(dim[dim.sitemap_url == f"{origin}/bad.xml"]) == 0
    assert len(dim[dim.sitemap_url == f"{origin}/trunc.gz"]) == 0
    assert set(dim[dim.sitemap_url == f"{origin}/sitemap.xml"].kind) == {"sitemap"}

    stub = SimpleNamespace(sitemaps_pdf=dim)
    pages = CrawlRunner._discover_sitemap_pages(
        stub, f"{origin}/", [f"{origin}/sitemap.xml"], 100
    )
    # sm-a's urls lastmod-desc, then sm-b's in file order (no lastmod)
    assert pages[:8] == (
        [f"{origin}/a{i}" for i in (4, 3, 2, 1, 0)]
        + [f"{origin}/b{i}" for i in (0, 1, 2)]
    )
    assert f"{origin}/deep" not in pages  # depth cap (sitemap.rs:13-15)
