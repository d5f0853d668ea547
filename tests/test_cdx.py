"""SURT canonicalization + the range-sharded CDX index plan."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from my_crawler_spark.operators.cdx import cdx_index, cdx_shard_index, surt_key

CASES = [
    # (url, expected surt)
    ("https://www.Example.org/A/b?z=1&a=2#f", "org,example)/a/b?a=2&z=1"),
    ("https://example.org:443/x", "org,example)/x"),
    ("http://example.org:80/x", "org,example)/x"),
    ("http://example.org:8080/x", "org,example:8080)/x"),
    ("https://sub.www.example.org/", "org,example,www,sub)/"),  # inner www kept
    ("https://example.org", "org,example)/"),
    ("https://example.org/p?", "org,example)/p"),
    ("HTTPS://WWW.EXAMPLE.ORG/P", "org,example)/p"),
    ("ftp://example.org/x", None),
    ("not a url", None),
]


def test_surt_key_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [r["s"] for r in df.select(surt_key(F.col("url")).alias("s")).collect()]
    for (u, want), g in zip(CASES, got):
        assert g == want, u


def test_cdx_index_sorted_shards_and_secondary_index(spark):
    rows = [
        (f"https://h{i % 5}.example.com/p{i:04d}?b=2&a={i}",
         datetime(2026, 1, 1, tzinfo=timezone.utc).replace(second=i % 60))
        for i in range(400)
    ]
    recs = spark.createDataFrame(rows, "url string, fetched_at timestamp")
    idx = cdx_index(recs, shards=4)
    # every partition is internally sorted by (surt, ts14)
    def check_sorted(it):
        prev = None
        for r in it:
            k = (r["surt"], r["ts14"])
            assert prev is None or prev <= k
            prev = k
            yield r
    assert idx.rdd.mapPartitions(lambda it: check_sorted(it)).count() == 400
    # range partitioning: shard key ranges are disjoint and ordered
    sidx = cdx_shard_index(idx).orderBy("shard").collect()
    assert sum(r["n_records"] for r in sidx) == 400
    firsts = [(r["first_surt"], r["first_ts14"]) for r in sidx]
    assert firsts == sorted(firsts)
    # disjoint: each shard's max < next shard's first
    maxes = (
        idx.withColumn("shard", F.spark_partition_id())
        .groupBy("shard")
        .agg(F.max(F.struct("surt", "ts14")).alias("mx"))
        .orderBy("shard")
        .collect()
    )
    for i in range(len(maxes) - 1):
        mx = (maxes[i]["mx"]["surt"], maxes[i]["mx"]["ts14"])
        assert mx <= firsts[i + 1]
    # lookup property: for any probe surt, the owning shard is the last one
    # with first_surt <= probe — and that shard really holds the row
    probe = sorted(r["surt"] for r in idx.select("surt").collect())[237]
    owner = max(s["shard"] for s in sidx if s["first_surt"] <= probe)
    holders = {
        r["shard"]
        for r in idx.withColumn("shard", F.spark_partition_id())
        .filter(F.col("surt") == probe)
        .select("shard")
        .collect()
    }
    assert owner in holders


def test_surt_groups_host_prefix_range(spark):
    # domain-level range scan: every url of example.com sorts inside the
    # ["com,example", "com,example~") key range, urls of other TLD-hosts
    # sort outside it
    urls = [
        "https://a.example.com/1",
        "https://b.example.com/2",
        "https://example.com/",
        "https://example.net/",
        "https://zzz.other.org/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r["url"]: r["s"] for r in df.select("url", surt_key(F.col("url")).alias("s")).collect()}
    inside = [u for u in urls if ".example.com" in u or u == "https://example.com/"]
    for u in inside:
        assert got[u].startswith("com,example"), u
    assert not got["https://example.net/"].startswith("com,example,")
    assert not got["https://zzz.other.org/x"].startswith("com,example")


def test_cdx_parquet_prefix_scan_pushes_down(spark, tmp_path):
    """The at-scale lookup story: the index written as range-sorted parquet
    serves a surt-prefix probe with a PUSHED filter (row-group stats prune
    shards whose [min,max] surt range misses the prefix) and prunes the
    read schema to the probed columns."""
    rows = [
        (f"https://h{i % 8}.example.com/p{i:04d}",
         datetime(2026, 1, 1, tzinfo=timezone.utc))
        for i in range(500)
    ]
    recs = spark.createDataFrame(rows, "url string, fetched_at timestamp")
    out = str(tmp_path / "cdx")
    cdx_index(recs, shards=8).write.parquet(out)
    probe = (
        spark.read.parquet(out)
        .filter(
            (F.col("surt") >= "com,example,h3)")
            & (F.col("surt") < "com,example,h3*")
        )
        .select("surt", "ts14")
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(surt" in plan
    assert probe.count() > 0
    got = [r["surt"] for r in probe.collect()]
    assert all(s.startswith("com,example,h3)") for s in got)
