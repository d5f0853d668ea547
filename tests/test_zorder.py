"""Z-order clustering: key correctness (python twin) + the data-skipping
property the layout exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_crawler_spark.operators.zorder import cluster_by_zorder, zorder_key2


def _morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_python_twin(spark):
    rows = [(i, (i * 37) % 65536, (i * 101) % 65536) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {
        r["id"]: r["zkey"]
        for r in df.select("id", zorder_key2("a", "b", bits=16)).collect()
    }
    for i, a, b in rows:
        assert got[i] == _morton(a, b), (i, a, b)
    # locality: close (a,b) cells share long key prefixes — the quad at
    # (a,b), (a+1,b), (a,b+1), (a+1,b+1) for even a,b spans exactly 4 keys
    base = _morton(10, 20)
    quad = {_morton(10, 20), _morton(11, 20), _morton(10, 21), _morton(11, 21)}
    assert quad == {base, base + 1, base + 2, base + 3}


def test_zorder_layout_prunes_both_dimensions(spark):
    # 64x64 grid of (a, b) cells, 4096 rows; probe an 8x8 box. Under the
    # Z layout the box's rows land in FEW shards; under a single-column
    # (a-sorted) layout the same box hits essentially every a-stripe shard
    # it crosses AND every b is scattered, so a b-window probe hits ALL
    # shards. Assert the z layout touches at most half the shards on the
    # 2-D box, while the one-column layout touches all of them on the
    # b-only window.
    rows = [(i, i // 64, i % 64) for i in range(4096)]  # full 64x64 grid
    df = spark.createDataFrame(rows, "id long, a long, b long")
    z = cluster_by_zorder(df, "a", "b", bits=6, shards=16).persist()
    try:
        box = (F.col("a").between(16, 23)) & (F.col("b").between(32, 39))
        zp = z.withColumn("p", F.spark_partition_id())
        z_total = zp.select("p").distinct().count()
        z_hit = zp.filter(box).select("p").distinct().count()
        assert z_hit <= z_total // 2, (z_hit, z_total)  # 2-D pruning bites
        # single-column layout baseline: a b-window probe touches EVERY
        # non-empty shard (b is scattered within each a-stripe)
        a_sorted = df.repartitionByRange(16, "a").sortWithinPartitions("a")
        ap = a_sorted.withColumn("p", F.spark_partition_id())
        a_total = ap.select("p").distinct().count()
        b_hit = ap.filter(F.col("b").between(32, 39)).select("p").distinct().count()
        assert b_hit == a_total, (b_hit, a_total)
    finally:
        z.unpersist()
