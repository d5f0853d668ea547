"""Bucketed-table layout: the amortized shuffle-free join path at 100 TB.

A fact table joined on the same key by every downstream query (lineitem on
l_orderkey, the chunk table on point_id, the frontier on host_hash) pays a
full shuffle PER QUERY if stored flat. Writing it ONCE as a Spark-native
bucketed table (``bucketBy(n, key)`` + ``sortBy(key)``) moves that cost to
the write: both sides of a same-key equi-join then scan bucket-aligned
files and the planner inserts NO Exchange on either side — at 10^10 rows
that is the difference between a per-query multi-TB shuffle and none.

- write_bucketed : persist a DataFrame as a bucketed+sorted external
  parquet table (DSv1 bucketing — hash(key) mod n file groups, one sorted
  parquet file set per bucket) and return the catalog-backed DataFrame
  whose scan carries the bucket spec.
- bucketed_join  : equi-join two same-bucketed tables. With equal bucket
  counts the plan is a SortMergeJoin fed directly by the two FileScans
  (``tests/test_explain_plans.py`` asserts zero Exchange); with one side
  at a multiple of the other, Spark coalesces buckets instead of
  shuffling.

Cluster notes: bucket count is a LAYOUT property — pick it once per table
at ~(table bytes / 1 GiB) and keep every co-joined table at the same count
(or an integer multiple). Bucket pruning also serves point lookups: a
``key = k`` filter scans exactly one bucket's files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> DataFrame:
    """Write ``df`` as a bucketed external parquet table and return the
    table-backed DataFrame (its scan advertises the bucket spec, which is
    what lets the join planner elide the Exchange).

    ``sort=True`` additionally sorts within buckets on the key so a
    SortMergeJoin can skip its Sort stage too. ``mode("overwrite")`` makes
    the call idempotent per (session, name).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)
    return df.sparkSession.table(name)


def bucketed_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket keys. This is just
    ``join`` — the point is the CONTRACT: both inputs must come from
    ``write_bucketed`` (or a catalog table with a bucket spec) on the same
    key family and compatible bucket counts, and then the physical plan is
    Exchange-free. Kept as a named op so pipelines state the layout
    assumption explicitly instead of relying on it silently."""
    return left.join(right, left[left_key] == right[right_key], how)
