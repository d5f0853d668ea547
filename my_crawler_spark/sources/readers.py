"""Input readers + seed filtering (S6, S11, F8, Q10 — bulk_crawl.py, ranking.rs).

- read_seed_list     : one-URL-per-line text, skip blanks/# (bulk_crawl.py:79-82)
- seed_skip_filter   : the bulk driver's skip rules with a reason histogram
                       (bulk_crawl.py:48-70, 198-217): skip-domain substring
                       match in BOTH directions, URL skip-patterns, non-http(s)
- read_domain_ranks  : Tranco-style rank,domain CSV -> normalized-host dim
                       (api/src/ranking.rs:26-41, 74-78)
- resume_anti_join   : drop seeds already in the progress table (Q10,
                       bulk_crawl.py:203-212)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.url import url_host, url_scheme

DEFAULT_SKIP_PATTERNS = ["/login", "?token=", "/logout", "/signup"]


def read_seed_list(spark: SparkSession, path: str) -> DataFrame:
    """-> (url) — trimmed, blanks and #comments dropped."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter((F.col("url") != "") & ~F.col("url").startswith("#"))
    )


def seed_skip_filter(
    seeds: DataFrame,
    skip_domains: list[str] | None = None,
    skip_patterns: list[str] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Adds ``skip_reason`` (null = keep). Reference reasons & precedence
    (bulk_crawl.py:48-70): non-http(s) -> 'scheme'; domain in skip list
    (substring containment in either direction) -> 'domain'; URL contains a
    skip pattern -> 'pattern'."""
    skip_domains = skip_domains if skip_domains is not None else []
    skip_patterns = (
        skip_patterns if skip_patterns is not None else DEFAULT_SKIP_PATTERNS
    )
    url = F.col(url_col)
    host = url_host(url)
    domain_hit = F.lit(False)
    for d in skip_domains:
        dl = d.lower()
        domain_hit = domain_hit | host.contains(dl) | F.lit(dl).contains(host)
    pattern_hit = F.lit(False)
    for p in skip_patterns:
        pattern_hit = pattern_hit | url.contains(p)
    reason = (
        F.when(~url_scheme(url).isin("http", "https"), F.lit("scheme"))
        .when(domain_hit, F.lit("domain"))
        .when(pattern_hit, F.lit("pattern"))
        .otherwise(F.lit(None).cast("string"))
    )
    return seeds.withColumn("skip_reason", reason)


def skip_reason_histogram(filtered: DataFrame) -> DataFrame:
    """bulk_crawl.py:198-217's reason counts."""
    return (
        filtered.groupBy(F.coalesce("skip_reason", F.lit("kept")).alias("reason"))
        .agg(F.count("*").alias("n"))
    )


def read_domain_ranks(spark: SparkSession, path: str) -> DataFrame:
    """rank,domain CSV -> (rank:int, domain:string) with normalize_host
    semantics (ranking.rs:74-78: trim, strip trailing '.', strip 'www.',
    lowercase)."""
    raw = spark.read.csv(path, schema="rank int, domain string")
    host = F.lower(F.trim(F.col("domain")))
    host = F.regexp_replace(host, r"\.$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    return raw.select("rank", host.alias("domain")).filter(
        F.col("rank").isNotNull() & (F.col("domain") != "")
    )


def resume_anti_join(seeds: DataFrame, progress: DataFrame, url_col: str = "url") -> DataFrame:
    """Q10: seeds not yet submitted (bulk_crawl.py:203-212)."""
    return seeds.join(progress.select(url_col).distinct(), [url_col], "left_anti")
