"""Robots matcher + policy tests — mirrors spider/src/robots.rs:162-194."""

from __future__ import annotations

from my_crawler_spark.functions.robots import (
    policy_for_status,
    robots_allowed,
    robots_sitemaps,
)

BODY = """
User-agent: *
Disallow: /private/
Allow: /private/ok

User-agent: badbot
Disallow: /

Sitemap: https://a.com/sitemap.xml
"""


def test_basic_matching():
    assert robots_allowed(BODY, "my_crawler", "https://a.com/page")
    assert not robots_allowed(BODY, "my_crawler", "https://a.com/private/x")
    # longest match wins: Allow /private/ok beats Disallow /private/
    assert robots_allowed(BODY, "my_crawler", "https://a.com/private/ok")
    # specific agent group
    assert not robots_allowed(BODY, "badbot", "https://a.com/anything")


def test_wildcards_and_anchor():
    body = "User-agent: *\nDisallow: /*.json$\nDisallow: /tmp*\n"
    assert not robots_allowed(body, "x", "https://a.com/data.json")
    assert robots_allowed(body, "x", "https://a.com/data.json5")
    assert not robots_allowed(body, "x", "https://a.com/tmp/file")


def test_empty_and_missing():
    assert robots_allowed("", "x", "https://a.com/x")
    assert robots_allowed(None, "x", "https://a.com/x")
    assert robots_allowed("User-agent: *\nDisallow:\n", "x", "https://a.com/x")


def test_sitemap_extraction():
    assert robots_sitemaps(BODY) == ["https://a.com/sitemap.xml"]
    assert robots_sitemaps("") == []


def test_policy_table():
    # 2xx -> body, 24h (robots.rs:100-107)
    body, allow_all, ttl = policy_for_status(200, "User-agent: *\nDisallow: /x\n", None)
    assert body is not None and not allow_all and ttl == 24 * 3600
    # 4xx -> allow-all, 24h (robots.rs:108-114)
    body, allow_all, ttl = policy_for_status(404, "", None)
    assert body is None and allow_all and ttl == 24 * 3600
    # 5xx, no stale -> disallow, 5 min (robots.rs:115-123)
    body, allow_all, ttl = policy_for_status(500, "", None)
    assert body is None and not allow_all and ttl == 300
    # 5xx with stale body -> stale-if-error
    body, allow_all, ttl = policy_for_status(500, "", "User-agent: *\nAllow: /\n")
    assert body is not None and ttl == 24 * 3600


def test_query_string_matched():
    body = "User-agent: *\nDisallow: /search?q=\n"
    assert not robots_allowed(body, "x", "https://a.com/search?q=test")
    assert robots_allowed(body, "x", "https://a.com/search")


def test_vectorized_gate_equals_per_row_matcher(spark):
    """robots_gate's batch matcher (compiled rules + pandas .str) must agree
    with robots_allowed row by row on adversarial paths."""
    from my_crawler_spark.operators.politeness import PRODUCT_TOKEN, robots_gate

    body = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok\n"
        "Disallow: /*.json$\n"
        "Disallow: /search?q=\n"
        "Allow: /search?q=safe\n"
        "Disallow: /tmp*\n"
    )
    urls = [
        "https://a.com/", "https://a.com/page", "https://a.com/private/x",
        "https://a.com/private/ok", "https://a.com/private/ok/deeper",
        "https://a.com/data.json", "https://a.com/data.json5",
        "https://a.com/search?q=test", "https://a.com/search?q=safe",
        "https://a.com/search", "https://a.com/tmp/file", "https://a.com",
        "https://a.com?q=1", "https://a.com/TMP/upper",
    ]
    rows = spark.createDataFrame(
        [("https://a.com", u) for u in urls], ["origin", "url"]
    )
    dim = spark.createDataFrame(
        [("https://a.com", body, False)], ["origin", "entry_body", "allow_all"]
    )
    got = {r.url: r.robots_allowed_flag for r in robots_gate(rows, dim).collect()}
    for u in urls:
        assert got[u] == robots_allowed(body, PRODUCT_TOKEN, u), u
