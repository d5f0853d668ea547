"""Sitemap XML parsing: urlset / sitemapindex, with gzip support.

Re-expresses the reference's sitemap fetch+parse step
(spider/src/sitemap.rs:88-99: gzip-decode when the payload is gzipped,
then parse <urlset>/<sitemapindex> entries) as an Arrow-batched Spark
stage. The BFS over sitemap files — depth/file/page caps, lastmod-desc
ordering (sitemap.rs:13-15,17-75) — stays in
``plans/crawl_plan.py:_discover_sitemap_pages``, which consumes the
``(sitemap_url, kind, loc, lastmod)`` dimension this module produces.

Parsing is namespace-agnostic (matches on local tag names), tolerant of
malformed XML (a bad document yields zero entries, like the reference's
``Result``-swallowing fetch loop), and sniffs gzip by magic bytes rather
than trusting content headers.
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SITEMAP_MAX_BYTES = 10 * 1024 * 1024  # MAX_DECOMPRESSED_BYTES (sitemap.rs:15,92-99)


def parse_sitemap_bytes(body: bytes | None) -> list[tuple[str, str, str | None]]:
    """-> [(kind, loc, lastmod_text)] with kind in {'url', 'sitemap'}.

    Gzip-sniffs (1f 8b magic); malformed XML or oversized payloads yield [].
    Decompression is bounded (read cap + 1 byte, like the reference's
    ``.take()`` reader, sitemap.rs:92-99): a small gzip bomb never
    materializes beyond the cap in executor memory.
    """
    if not body:
        return []
    if body[:2] == b"\x1f\x8b":
        try:
            body = gzip.GzipFile(fileobj=io.BytesIO(body)).read(SITEMAP_MAX_BYTES + 1)
        except (OSError, EOFError):  # BadGzipFile is OSError; truncated = EOFError
            return []
    if len(body) > SITEMAP_MAX_BYTES:
        return []
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return []
    root_tag = root.tag.rsplit("}", 1)[-1]
    if root_tag == "sitemapindex":
        kind = "sitemap"
    elif root_tag == "urlset":
        kind = "url"
    else:
        return []
    out: list[tuple[str, str, str | None]] = []
    for child in root:
        loc = lastmod = None
        for el in child:
            name = el.tag.rsplit("}", 1)[-1]
            if name == "loc":
                loc = (el.text or "").strip()
            elif name == "lastmod":
                lastmod = (el.text or "").strip()
        if loc:
            out.append((kind, loc, lastmod))
    return out


PARSED_SCHEMA = "sitemap_url string, kind string, loc string, lastmod timestamp"


def parse_sitemaps(raw: DataFrame) -> DataFrame:
    """(sitemap_url:string, body:binary) -> the sitemaps dimension
    (sitemap_url, kind, loc, lastmod) via mapInPandas — each Arrow batch
    is decoded/parsed in one Python pass, no per-row round trips."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, body in zip(pdf["sitemap_url"], pdf["body"]):
                for kind, loc, lastmod in parse_sitemap_bytes(body):
                    rows.append((url, kind, loc, lastmod))
            out = pd.DataFrame(
                rows, columns=["sitemap_url", "kind", "loc", "lastmod"]
            )
            out["lastmod"] = pd.to_datetime(
                out["lastmod"], errors="coerce", utc=True
            ).dt.tz_localize(None)
            yield out

    return raw.select("sitemap_url", "body").mapInPandas(gen, PARSED_SCHEMA)


def sitemaps_dim_from_bytes(spark, raw_rows: list[tuple[str, bytes]]) -> pd.DataFrame:
    """Convenience: raw (sitemap_url, body) pairs -> the pandas dimension
    CrawlRunner consumes. Dimension-sized by construction (<= 20 files per
    request after the reference's caps), so toPandas is safe."""
    raw = spark.createDataFrame(raw_rows, "sitemap_url string, body binary")
    return parse_sitemaps(raw).toPandas()
