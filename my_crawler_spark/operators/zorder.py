"""Z-order (Morton) clustering keys — multi-dimensional data skipping.

A 100 TB events/crawl table is probed along MORE than one dimension (time ×
user, host × fetch time, width × height). Sorting by one column makes the
other a full scan; interleaving the bits of both (the Z-order curve — the
layout behind Delta's OPTIMIZE ZORDER and Databricks/Iceberg clustering)
keeps 2-D-close rows file-close, so parquet row-group min/max stats prune
BOTH dimensions.

``zorder_key2`` is a pure unrolled JVM bit expression (2·bits OR terms —
O(bits) Catalyst nodes, no UDF), exactly replayable in integer SQL, so the
key assignment itself is DuckDB-oracled. ``cluster_by_zorder`` is the
layout operator: range-partition + local sort on the key, no global stage —
identical plan shape to cdx_index.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key2(a, b, bits: int = 16) -> F.Column:
    """Morton-interleave the low `bits` bits of two non-negative integer
    columns: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    -> long. Columns are masked to `bits` bits first (callers bucket or
    clamp wider domains — at 16 bits the key spans 4G cells, plenty for
    file-level skipping)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31")
    mask = (1 << bits) - 1
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    am = a.cast("long").bitwiseAND(F.lit(mask))
    bm = b.cast("long").bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(am, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(F.shiftleft(F.shiftright(bm, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda x, y: x.bitwiseOR(y), terms).alias("zkey")


def cluster_by_zorder(
    df: DataFrame,
    a: str,
    b: str,
    bits: int = 16,
    shards: int | None = None,
) -> DataFrame:
    """Lay `df` out along the Z-curve of (a, b): adds `zkey`, range-
    partitions on it (sampled boundaries — no global sort stage) and sorts
    each shard locally. Written to parquet, a 2-D box predicate then
    prunes on BOTH columns' row-group stats instead of one."""
    keyed = df.withColumn("zkey", zorder_key2(a, b, bits))
    n = shards or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, "zkey").sortWithinPartitions("zkey")
