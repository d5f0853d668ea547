"""Freshness-aware recrawl scheduling (beyond-reference, crawl tier).

The reference crawls a frontier once (`crawl_loop.rs` visits each admitted
URL a single time). A production crawler also has to decide WHEN to come
back: pages change at wildly different rates, and re-fetching everything on
one cadence either wastes politeness budget on static pages or serves stale
content for fast-moving ones. The classic answer (Cho & Garcia-Molina,
"Effective Page Refresh Policies for Web Crawlers") is a per-page Poisson
change-rate estimate from the visit history, with the revisit interval
inversely proportional to the estimated rate.

Everything here is windows + aggregations over the visit log — one shuffle
on the page key for the lag() pass whose partitioning the groupBy then
reuses (Catalyst collapses the two into a single Exchange). At 100 TB the
visit log is the biggest table the crawler owns; nothing in this plan
broadcasts it, sorts it globally, or moves it more than once.

Determinism contract (the DuckDB oracle replays it bit-for-bit): timestamps
are exact integer ticks (the entry uses epoch MICROseconds — fractional
epoch seconds would round in DuckDB's BIGINT cast but truncate in Spark's),
the smoothed rate and interval are rounded to 6dp, and the due timestamp
goes through floor() before the long cast (DuckDB CAST(double AS BIGINT)
rounds; Spark's truncates — floor() first makes them agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_history(
    visits: DataFrame,
    page_col: str = "page_id",
    ts_col: str = "ts",
    sig_col: str = "sig",
    order_col: str = "visit_id",
) -> DataFrame:
    """Per-page visit history -> change summary
    (page_id, n_visits, n_changes, first_ts, last_ts).

    A "change" is a visit whose content signature differs from the previous
    visit's (first visit is not a change). `order_col` breaks timestamp
    ties so the lag() order — and therefore the change count — is total.
    """
    w = Window.partitionBy(page_col).orderBy(F.col(ts_col), F.col(order_col))
    marked = visits.withColumn("__prev", F.lag(sig_col).over(w)).withColumn(
        "__changed",
        (F.col("__prev").isNotNull() & (F.col(sig_col) != F.col("__prev"))).cast(
            "long"
        ),
    )
    return marked.groupBy(page_col).agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum("__changed").alias("n_changes"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )


def recrawl_schedule(
    visits: DataFrame,
    now: int,
    ticks_per_day: int = 86_400_000_000,
    page_col: str = "page_id",
    ts_col: str = "ts",
    sig_col: str = "sig",
    order_col: str = "visit_id",
    min_interval_days: float = 0.25,
    max_interval_days: float = 30.0,
) -> DataFrame:
    """Visit log -> revisit plan, one row per page:
    (page_id, n_visits, n_changes, rate_per_day, interval_days, next_due,
    overdue, due_now). Timestamps are integer ticks (`ticks_per_day`
    defaults to epoch microseconds).

    rate = (changes + 0.5) / (span_days + 1)  — Laplace-smoothed Poisson
    estimate: a never-changing page still gets a finite rate (and the
    max interval), a page observed once gets the prior. interval = 1/rate
    clamped to [min, max]; next_due = last visit + interval; overdue =
    now - next_due (positive means fetch it this round).

    The output is the priority feed for the frontier: `due_now` pages join
    the admission pipeline ordered by overdue, so politeness budget goes
    to the stalest fast-changing pages first.
    """
    h = change_history(visits, page_col, ts_col, sig_col, order_col)
    tpd = F.lit(float(ticks_per_day))
    span_days = (F.col("last_ts") - F.col("first_ts")).cast("double") / tpd
    rate = F.round(
        (F.col("n_changes").cast("double") + F.lit(0.5)) / (span_days + F.lit(1.0)),
        6,
    )
    interval = F.round(
        F.least(
            F.greatest(F.lit(1.0) / F.col("rate_per_day"), F.lit(min_interval_days)),
            F.lit(max_interval_days),
        ),
        6,
    )
    due = F.col("last_ts") + F.floor(tpd * F.col("interval_days")).cast("long")
    return (
        h.withColumn("rate_per_day", rate)
        .withColumn("interval_days", interval)
        .withColumn("next_due", due)
        .withColumn("overdue", F.lit(int(now)) - F.col("next_due"))
        .withColumn("due_now", F.col("overdue") >= 0)
        .select(
            page_col,
            "n_visits",
            "n_changes",
            "rate_per_day",
            "interval_days",
            "next_due",
            "overdue",
            "due_now",
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    ver_col: str = "page_version",
) -> DataFrame:
    """Crawl-snapshot delta: classify every key across two crawl rounds as
    added / removed / changed / unchanged by comparing content versions
    (the reference's page_version, text.py::page_version). The output is
    what downstream maintenance consumes: `changed` rows feed re-extract +
    re-embed, `removed` rows feed the stale-version delete (S9,
    sources/lake.py), `added` rows feed first-time indexing.

    One full outer join on the key — both sides shuffle once on key_col; at
    lake scale the snapshots are bucketed/partitioned by the same key so the
    exchange is a no-op. NULL-version rows classify by presence only (a
    missing version on both sides compares as unchanged via null-safe
    equality).

    -> (key, old_version, new_version, status)
    """
    o = old.select(
        F.col(key_col).alias("key"), F.col(ver_col).alias("old_version")
    )
    n = new.select(
        F.col(key_col).alias("key"), F.col(ver_col).alias("new_version")
    )
    # presence flags survive the outer join even when versions are NULL
    o = o.withColumn("_in_old", F.lit(True))
    n = n.withColumn("_in_new", F.lit(True))
    joined = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_version").eqNullSafe(F.col("new_version")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return joined.select("key", "old_version", "new_version", status.alias("status"))
