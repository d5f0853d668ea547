"""Event-sequence analytics over the events table (funnel / ordered-step
semantics) — the product-analytics counterpart to sessionize/windowed aggs.

funnel_stages answers "how many users VIEWED, then CLICKED after viewing,
then PURCHASED after clicking": for each user, the earliest completion of
each successive step STRICTLY after the previous step's completion.
Strictness is on the (ts, event_id) pair, so simultaneous-timestamp events
resolve deterministically (epoch ticks are exact integers per the engine's
NTZ contract — recrawl.py's determinism note).

Plan: one filtered groupBy per step plus one join per step transition —
every shuffle is keyed on user_id, so Catalyst reuses a single Exchange
across the whole chain; no windows, no per-user sorting. At 10^10 events
the per-step relations are user-cardinality, not event-cardinality, after
the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """-> (user_id, t1..tN epoch-seconds of each step's earliest valid
    completion — NULL once the funnel breaks — and stage = steps reached).
    Only users who completed step 1 appear (a funnel starts at its top)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    key = F.struct(
        F.col(ts_col).cast("timestamp").cast("long").alias("t"),
        F.col(order_col).alias("o"),
    )
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(key).alias("k1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col), key.alias("k")
        )
        advanced = (
            nxt.join(cur.select(user_col, f"k{i - 1}"), user_col)
            .filter(F.col("k") > F.col(f"k{i - 1}"))
            .groupBy(user_col)
            .agg(F.min("k").alias(f"k{i}"))
        )
        cur = cur.join(advanced, user_col, "left")
    stage = sum(
        (F.col(f"k{i}").isNotNull()).cast("int") for i in range(1, len(steps) + 1)
    )
    return cur.select(
        user_col,
        *[F.col(f"k{i}.t").alias(f"t{i}") for i in range(1, len(steps) + 1)],
        stage.alias("stage"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity bucket
    (epoch // bucket_seconds — week by default), counted in every later
    bucket they return in. -> (cohort, offset, active_users) where offset 0
    is the cohort's own bucket, plus cohort_size for rate computation.

    Two user-keyed aggregates + one join that reuses the same Exchange;
    distinct (user, bucket) pairs collapse before counting so chatty users
    weigh once per bucket. The epoch//bucket arithmetic is exact integer
    division — the DuckDB twin replays it bit-for-bit."""
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    ub = events.select(
        F.col(user_col), F.floor(epoch / F.lit(bucket_seconds)).cast("long").alias("b")
    ).distinct()
    first = ub.groupBy(user_col).agg(F.min("b").alias("cohort"))
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    joined = ub.join(first, user_col).select(
        "cohort", (F.col("b") - F.col("cohort")).alias("offset"), user_col
    )
    counts = joined.groupBy("cohort", "offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )
    return counts.join(sizes, "cohort").select(
        "cohort", "offset", "active_users", "cohort_size"
    )
