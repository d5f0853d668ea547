from __future__ import annotations

from pyspark.sql import functions as F

from my_crawler_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    """Hand-checkable as-of: latest right row at or before each left ts,
    per group; equal timestamps match; no prior row -> NULLs; groups
    don't leak."""
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 205), (3, "u1", 50), (4, "u2", 100)],
        "event_id long, user_id string, ts long",
    )
    right = spark.createDataFrame(
        [(10, "u1", 100, 1.0), (11, "u1", 200, 2.0), (12, "u2", 150, 3.0)],
        "event_id long, user_id string, ts long, value double",
    )
    got = {
        r.event_id: r
        for r in asof_join(
            left, right, by=["user_id"], ts_col="ts",
            right_cols=["event_id", "value"], tiebreak_col="event_id",
        ).collect()
    }
    assert got[1].event_id_right == 10 and got[1].ts_right == 100  # equal ts matches
    assert got[2].event_id_right == 11 and got[2].value_right == 2.0
    assert got[3].event_id_right is None and got[3].value_right is None
    assert got[4].event_id_right is None  # u2's view is later than its event


def test_asof_join_tiebreak_and_plan(spark):
    """Two right rows at the same ts: the largest tiebreak wins
    deterministically; and the physical plan contains NO join node — the
    operator is union + one partitioned window."""
    left = spark.createDataFrame([(1, "u", 10)], "event_id long, user_id string, ts long")
    right = spark.createDataFrame(
        [(7, "u", 10, 7.0), (9, "u", 10, 9.0)],
        "event_id long, user_id string, ts long, value double",
    )
    out = asof_join(
        left, right, by=["user_id"], ts_col="ts",
        right_cols=["event_id", "value"], tiebreak_col="event_id",
    )
    assert out.collect()[0].event_id_right == 9
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_range_join_exact_once_per_pair(spark):
    """Each containing (point, interval) pair appears EXACTLY once even
    when the interval spans many buckets; boundaries are inclusive; no
    cross-group leakage; the plan's join is an equi hash/sort-merge join,
    not a broadcast-nested-loop."""
    from my_crawler_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 250), (3, "u", 999), (4, "w", 100)],
        "pid long, user_id string, ts long",
    )
    intervals = spark.createDataFrame(
        [(10, "u", 100, 300), (11, "u", 240, 260), (12, "w", 500, 600)],
        "iid long, user_id string, start long, end long",
    )
    out = range_join(points, intervals, bucket_width=50, by=["user_id"])
    got = sorted((r.pid, r.iid_iv) for r in out.collect())
    # point 1 at 100: interval 10 only (inclusive start);
    # point 2 at 250: 10 AND 11 (overlap), each exactly once;
    # point 3/4: nothing
    assert got == [(1, 10), (2, 10), (2, 11)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
