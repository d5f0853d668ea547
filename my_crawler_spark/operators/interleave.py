"""Scheduling-window operators: grouping, interleave, per-group top-k
(Q8, Q9, Q12 — bulk_crawl.py:131-148, sitemap.rs:35,53-64).

Classic window patterns, kept as named operators so the oracle SQL can
mirror them 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_by_domain(df: DataFrame, host_col: str = "host", url_col: str = "url") -> DataFrame:
    """Q8 (bulk_crawl.py:131-137): ordered URL list per host."""
    return df.groupBy(host_col).agg(
        F.sort_array(F.collect_list(F.struct(F.col("seq"), F.col(url_col)))).alias("__s")
    ).select(
        host_col,
        F.transform("__s", lambda s: s[url_col]).alias("urls"),
        F.size("__s").alias("n_urls"),
    )


def interleave_by_domain(
    df: DataFrame, host_col: str = "host", order_col: str = "seq"
) -> DataFrame:
    """Q9 (bulk_crawl.py:140-148): round-robin one URL per domain — the
    zip_longest transpose as rank-then-sort. Adds ``emit_order``.

    The final total order is stamped by ranking.global_rank (range
    partition + local sort + broadcast offsets), not an unpartitioned
    row_number window: the op's whole point is fleet-scale seed
    scheduling, and the old global window funnelled every seed through
    one task (guide §2.4; no-SinglePartition plan-tested). (rr_round,
    host, order_col) is a total order — rr_round is unique within a
    host — so the stamped ranks are identical to the window's.
    """
    from .ranking import global_rank

    w = Window.partitionBy(host_col).orderBy(order_col)
    ranked = df.withColumn("rr_round", F.row_number().over(w))
    out = global_rank(
        ranked,
        [F.col("rr_round"), F.col(host_col), F.col(order_col)],
        rank_col="emit_order",
    )
    res = out.withColumn("emit_order", F.col("emit_order").cast("int"))
    # forward global_rank's pinned intermediate so callers can free it
    res._graft_persisted = out._graft_persisted
    return res


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Q12/S5 (sitemap.rs:57-64): per-group top-k by order_col."""
    oc = F.desc(order_col) if descending else F.asc(order_col)
    w = Window.partitionBy(group_col).orderBy(oc)
    return (
        df.withColumn("k_rank", F.row_number().over(w))
        .filter(F.col("k_rank") <= k)
    )
