"""SURT keys + CDX URL index — the Common Crawl / web-archive lookup layer.

A crawl at archive scale is useless without a sorted URL index: every WARC
record gets a SURT key (Sort-friendly URI Reordering Transform — public
format, used by CDX/CDXJ, OpenWayback, pywb) so that all captures of a URL,
and all URLs of a host/domain, are RANGE-CONTIGUOUS. That turns "all
captures of example.org/*" into a range scan instead of a full-index scan —
the same reason Common Crawl ships cluster.idx over its 300-file cdx-*.gz
set.

Everything here is JVM column expressions (no Python stage):

- ``surt_key``  : scheme/www stripped, host labels reversed and
  comma-joined, default port dropped, query params sorted, fragment
  dropped — lowercased. ``https://www.Example.org:443/A/b?z=1&a=2#f`` ->
  ``org,example)/a/b?a=2&z=1``.
- ``cdx_index`` : records -> (surt, ts14, original url, digest, mime,
  status, length) rows range-partitioned AND sorted by (surt, ts14) — at
  scale, written as N sorted shards + a first-key-per-shard secondary index
  (the cluster.idx analogue), which is exactly
  ``repartitionByRange(surt).sortWithinPartitions`` here.
- ``cdx_shard_index`` : the per-shard (first_surt, shard) secondary index,
  computed WITHOUT a global sort — one row per range partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.url import _authority, _path, url_scheme


def surt_host(host) -> F.Column:
    """Lowercased host with labels reversed and comma-joined; a leading
    ``www.`` label is dropped (SURT canonicalization)."""
    h = F.lower(host)
    h = F.when(h.startswith("www."), F.substring(h, 5, 1 << 20)).otherwise(h)
    return F.concat_ws(",", F.reverse(F.split(h, "\\.")))


def surt_key(url) -> F.Column:
    """The SURT form of an http(s) URL as one null-able expression.

    host labels reversed, default port dropped, path lowercased, query
    split on '&' and sorted (parameter order never affects identity in
    CDX), fragment dropped. Non-http(s) -> NULL."""
    url = F.trim(url)
    scheme = url_scheme(url)
    auth = F.lower(_authority(url))
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"), F.substring(auth, 1, F.length(auth) - 3)
    ).otherwise(auth)
    auth = F.when(
        (scheme == "https") & auth.endswith(":443"), F.substring(auth, 1, F.length(auth) - 4)
    ).otherwise(auth)
    host = F.regexp_extract(auth, r"^([^:]*)", 1)
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    path = F.lower(_path(url))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    nofrag = F.regexp_replace(url, "#.*$", "")
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(F.lower(query), "&")), "&")
    key = F.concat(
        surt_host(host),
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    ok = scheme.isin("http", "https") & (host != "")
    return F.when(ok, key).otherwise(F.lit(None))


_TS14 = "yyyyMMddHHmmss"


def cdx_index(
    records: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetched_at",
    shards: int | None = None,
) -> DataFrame:
    """records(url, fetched_at, + passthrough digest/mime/status/length
    when present) -> the CDX line relation, globally ordered by
    (surt, ts14) via range partitioning — no single-task sort stage.

    At 10^11 records this is the plan you want: repartitionByRange samples
    the surt distribution, each shard sorts locally, and the shard index
    (``cdx_shard_index``) gives the two-level lookup — a binary search in
    the tiny first-key index, then one sorted shard scan."""
    from pyspark import StorageLevel

    passthrough = [
        c for c in ("digest", "mime", "status", "length") if c in records.columns
    ]
    rows = (
        records.select(
            surt_key(F.col(url_col)).alias("surt"),
            F.date_format(F.col(ts_col), _TS14).alias("ts14"),
            F.col(url_col).alias("original"),
            *passthrough,
        )
        .filter(F.col("surt").isNotNull())
        # persist the computed keys: predicate substitution inlines the
        # whole SURT regex chain into the null filter, and the range
        # exchange's reservoir-sampling pass re-runs the child — without
        # the cache the chain evaluated up to 3x per record (guide §1.2);
        # disk-backed so a 10^11-record index build spills, not evicts
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = shards or rows.sparkSession.sparkContext.defaultParallelism
    return rows.repartitionByRange(n, "surt", "ts14").sortWithinPartitions(
        "surt", "ts14"
    )


def cdx_shard_index(index: DataFrame) -> DataFrame:
    """(shard, first_surt, first_ts14, n_records) — one row per range
    shard, computed by a per-partition aggregate (no global sort, no
    collect): the cluster.idx analogue that a reader binary-searches to
    pick the single shard covering a query key."""
    with_shard = index.withColumn("shard", F.spark_partition_id())
    return (
        with_shard.groupBy("shard")
        .agg(
            F.min(F.struct("surt", "ts14")).alias("first"),
            F.count(F.lit(1)).alias("n_records"),
        )
        .select(
            "shard",
            F.col("first.surt").alias("first_surt"),
            F.col("first.ts14").alias("first_ts14"),
            "n_records",
        )
    )
