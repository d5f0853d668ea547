"""Exact global ranking and crawl-budget allocation at cluster scale.

`global_rank` solves the problem every "exact top-K / quota" pipeline hits:
Spark's only built-in total-order rank is a window over an EMPTY
partitionBy, which funnels the whole table through one task (the same
anti-pattern `ivf_index`'s centroid pick had before round 4). The scalable
construction here is the classic range-partitioned zipWithIndex, kept
entirely in DataFrame land:

1. `repartitionByRange` on the (unique) sort key — rows are globally
   ordered BETWEEN partitions, and `sortWithinPartitions` orders them
   WITHIN each;
2. `monotonically_increasing_id()` projected after that sort encodes
   (partition_id << 33) + local_index, so `mid & (2^33 - 1)` is each row's
   rank inside its partition with zero extra exchange;
3. per-partition row counts (ONE bounded collect — #partitions rows, the
   same cost class as `bloom.py`'s n_banks fan-in) become a broadcast
   offsets dim, and rank = offset[partition] + local_index + 1.

Cost: one range exchange (plus its sampling pass) + one local sort + one
bounded collect — versus the single-task alternative that stops scaling at
one executor's memory. Ranks are exact and deterministic for any total
(tie-free) key, wherever the sampled range boundaries land.

`allocate_host_budget` uses it for the largest-remainder (Hamilton)
apportionment of a global fetch budget across hosts — the "how many pages
does each host get this cycle" decision a crawl scheduler makes right
before `interleave.py` orders the picks. All quota arithmetic is exact
BIGINT (budget*weight DIV/MOD total), so the DuckDB oracle hash-matches
bit-for-bit, and Σ allocated == budget exactly — no float quotas, no
rounding drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

_LOCAL_IDX_MASK = (1 << 33) - 1


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based exact global rank by `order_cols` — no global window.

    `order_cols` must be a total order (include a unique tiebreak column);
    ties split across range-partition boundaries would otherwise make the
    between-partition order only partial. The input is cached for the two
    consumers (the bounded per-partition count collect + the final plan)
    and should be unpersisted by the caller if it is large.
    """
    if num_partitions:
        parts = df.repartitionByRange(num_partitions, *order_cols)
    else:
        parts = df.repartitionByRange(*order_cols)
    s = (
        parts.sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    s = s.persist()
    counts = s.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["n"]
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(int(p)) for p in offsets]),
            F.array(*[F.lit(int(v)) for v in offsets.values()]),
        ),
        F.col("__pid"),
    )
    out = (
        s.withColumn(
            rank_col,
            (off + F.col("__mid").bitwiseAND(F.lit(_LOCAL_IDX_MASK)) + F.lit(1)).cast(
                "long"
            ),
        )
        .drop("__pid", "__mid")
    )
    # hand the persisted intermediate to callers that fully materialize the
    # result (e.g. a table commit) so they can free the cached blocks
    out._graft_persisted = s
    return out


def allocate_host_budget(
    hosts: DataFrame,
    budget: int,
    host_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """Largest-remainder (Hamilton) split of `budget` fetches across hosts.

    -> (host, weight, base_quota, remainder, rank, allocated) with
    Σ allocated == budget exactly. `weight` must be a non-negative BIGINT
    (popularity rank mass, discovered-URL count, ...): quota arithmetic is
    budget*weight DIV/MOD Σweight in exact integer space, extra units go to
    the largest remainders (host ascending breaks ties), so results are
    engine-independent.

    Plan: one 1-row totals relation crossJoined twice (Σweight, Σbase) —
    never a collect of the hosts table — plus `global_rank`'s range
    exchange. Nothing here is single-task at any host count.
    """
    b = F.lit(int(budget)).cast("long")
    totals = hosts.agg(F.sum(F.col(weight_col).cast("long")).alias("__tw"))
    quotas = (
        hosts.crossJoin(F.broadcast(totals))
        .withColumn("__num", b * F.col(weight_col).cast("long"))
        .withColumn("base_quota", F.expr("__num DIV __tw").cast("long"))
        .withColumn("remainder", F.pmod(F.col("__num"), F.col("__tw")).cast("long"))
        .drop("__num", "__tw")
    )
    leftover = quotas.agg(
        (b - F.sum("base_quota")).cast("long").alias("__extra")
    )
    ranked = global_rank(
        quotas,
        [F.col("remainder").desc(), F.col(host_col).asc()],
        rank_col="rank",
    )
    out = (
        ranked.crossJoin(F.broadcast(leftover))
        .withColumn(
            "allocated",
            (
                F.col("base_quota")
                + F.when(F.col("rank") <= F.col("__extra"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("long"),
        )
        .drop("__extra")
    )
    return out.select(
        host_col, weight_col, "base_quota", "remainder", "rank", "allocated"
    )
