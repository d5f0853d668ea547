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
    zip_longest transpose as rank-then-sort. Adds ``emit_order``."""
    w = Window.partitionBy(host_col).orderBy(order_col)
    ranked = df.withColumn("rr_round", F.row_number().over(w))
    w_out = Window.orderBy("rr_round", host_col, order_col)
    return ranked.withColumn("emit_order", F.row_number().over(w_out))


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
