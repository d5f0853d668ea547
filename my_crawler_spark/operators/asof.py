"""Point-in-time (as-of) join — the temporal primitive Spark lacks.

`asof_join(left, right, ...)`: for each left row, attach the single most
recent right row with `right.ts <= left.ts` in the same `by` group (the
kdb/pandas `merge_asof` / DuckDB `ASOF JOIN` semantics — feature lookups
"as of" an event time, quote-at-trade, state-at-event).

The naive formulation is an inequality join — Catalyst can only plan it as
a broadcast-nested-loop or a range join with quadratic blow-up inside hot
groups. The cluster-scale re-expression is the UNION + ORDERED WINDOW
carry-forward:

1. tag right rows 0 and left rows 1, union them aligned on
   (by, ts, tag, payload-struct)
2. ONE shuffle: window per `by` group ordered by (ts, tag, tiebreak),
   `last(payload, ignorenulls=True)` over UNBOUNDED PRECEDING..CURRENT —
   every left row sees the latest right payload at or before its ts
   (right sorts BEFORE left at equal ts, so ties match)
3. keep the left rows, unpack the carried struct

No join node at all: cost = one shuffle + one sort per group, linear in
|left| + |right|, skew governed by the `by` key like any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join. Returns every `left` row plus `right_cols` (renamed
    with `suffix`) from the most recent right row at or before its
    `ts_col`; NULLs when no prior right row exists. `tiebreak_col` makes
    the pick deterministic when several right rows share a timestamp
    (latest by the tiebreak wins)."""
    right_cols = right_cols or [
        c for c in right.columns if c not in by and c != ts_col
    ]
    payload = F.struct(
        *[F.col(c) for c in right_cols], F.col(ts_col).alias("__rts")
    )
    tb = (
        F.col(tiebreak_col)
        if tiebreak_col
        else F.lit(0)
    )
    r = right.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        F.lit(0).alias("__tag"),
        tb.cast("string").alias("__tb"),
        payload.alias("__rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        F.lit(1).alias("__tag"),
        F.lit("").alias("__tb"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_col, "__tag", "__tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l).withColumn(
        "__m", F.last("__rv", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__tag") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__m")[c].alias(f"{c}{suffix}") for c in right_cols],
        F.col("__m")["__rts"].alias(f"{ts_col}{suffix}"),
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    bucket_width: int,
    by: list[str] | None = None,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Interval-containment join: every (point, interval) pair with
    start <= point <= end (and equal `by` keys) — the attribution-window /
    IP-range / time-slice lookup.

    Catalyst plans the naive `ON p BETWEEN s AND e` as a broadcast-nested-
    loop (quadratic). The scale shape is GRID BUCKETING: explode each
    interval into the fixed-width buckets it overlaps, put each point in
    its single bucket, equi-join on (by, bucket), filter exact containment.
    A point lives in exactly one bucket and an interval appears once per
    overlapped bucket, so each matching pair is emitted EXACTLY once — no
    dedup pass. Cost is linear with blow-up factor len(interval)/width;
    pick bucket_width ~ the median interval length.

    Columns: all point columns + the interval's (start, end) and its other
    columns suffixed `_iv`.
    """
    by = by or []
    b_pt = F.floor(F.col(point_col) / F.lit(bucket_width)).alias("__bucket")
    iv_payload = [c for c in intervals.columns if c not in by]
    p = points.select("*", b_pt)
    iv = intervals.select(
        *[F.col(c) for c in by],
        *[F.col(c).alias(f"{c}_iv") for c in iv_payload],
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)),
                F.floor(F.col(end_col) / F.lit(bucket_width)),
            )
        ).alias("__bucket"),
    )
    return (
        p.join(iv, [*by, "__bucket"])
        .filter(
            (F.col(point_col) >= F.col(f"{start_col}_iv"))
            & (F.col(point_col) <= F.col(f"{end_col}_iv"))
        )
        .drop("__bucket")
    )
