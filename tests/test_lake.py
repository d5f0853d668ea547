"""Snapshot-table layer: commits, time travel, merge, stale-version delete."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from my_crawler_spark.sources.lake import (
    Catalog,
    SnapshotTable,
    upsert_chunks_with_stale_delete,
)

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def test_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "t1", SCHEMA)
    assert t.read().count() == 0
    s1 = t.commit(spark.createDataFrame([(1, "a")], SCHEMA))
    s2 = t.commit(spark.createDataFrame([(2, "b")], SCHEMA))
    assert t.read().count() == 2
    assert t.read(snapshot_id=s1).count() == 1  # time travel
    assert t.history() == [s1, s2]


def test_overwrite(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "t2", SCHEMA)
    t.commit(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    t.commit(spark.createDataFrame([(9, "z")], SCHEMA), mode="overwrite")
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0].k == 9


def test_merge_upsert(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "t3", SCHEMA)
    t.commit(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    t.merge_upsert(spark.createDataFrame([(2, "B"), (3, "c")], SCHEMA), ["k"])
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_stale_version_delete(spark, tmp_path):
    """S9 (qdrant.rs:133-139): re-crawling a page at a new version removes
    the old version's points for that url, leaves other urls alone."""
    schema = T.StructType(
        [
            T.StructField("point_id", T.StringType()),
            T.StructField("source_url", T.StringType()),
            T.StructField("page_version", T.StringType()),
        ]
    )
    t = SnapshotTable(spark, str(tmp_path), "chunks", schema)
    t.commit(
        spark.createDataFrame(
            [("p1", "https://a/x", "v1"), ("p2", "https://a/x", "v1"),
             ("p3", "https://a/y", "v1")],
            schema,
        )
    )
    new = spark.createDataFrame([("p9", "https://a/x", "v2")], schema)
    upsert_chunks_with_stale_delete(t, new)
    got = {(r.point_id, r.page_version) for r in t.read().collect()}
    assert got == {("p9", "v2"), ("p3", "v1")}  # v1 points of /x deleted


def test_empty_append_is_checkpoint_marker(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "t4", SCHEMA)
    s1 = t.commit(spark.createDataFrame([(1, "a")], SCHEMA))
    s2 = t.commit(spark.createDataFrame([], SCHEMA))
    assert s2 == s1 + 1 and t.read().count() == 1


def test_catalog_reuse(spark, tmp_path):
    c = Catalog(spark, str(tmp_path))
    assert c.table("x", SCHEMA) is c.table("x", SCHEMA)
