from datetime import datetime

from my_crawler_spark.operators.events import funnel_stages


def test_funnel_stages_ordered_semantics(spark):
    T = lambda s: datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # u1 completes the funnel in order
        (1, T(1), 1, "view"), (2, T(2), 1, "click"), (3, T(3), 1, "purchase"),
        # u2 clicks BEFORE viewing -> click must come from after the view
        (4, T(1), 2, "click"), (5, T(2), 2, "view"), (6, T(3), 2, "click"),
        # u3 views only
        (7, T(1), 3, "view"),
        # u4 purchases with no view -> not in the funnel at all
        (8, T(1), 4, "purchase"),
        # u5: simultaneous ts, event_id breaks the tie (view id 9 < click id 10)
        (9, T(5), 5, "view"), (10, T(5), 5, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    got = {
        r["user_id"]: (r["stage"], r["t1"], r["t2"], r["t3"])
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert set(got) == {1, 2, 3, 5}  # u4 never viewed
    assert got[1][0] == 3 and got[1][1] < got[1][2] < got[1][3]
    assert got[2][0] == 2 and got[2][3] is None  # only the post-view click counts
    assert got[3] == (1, got[3][1], None, None)
    assert got[5][0] == 2  # same-ts click admitted via event_id tie-break


def test_retention_cohorts_counts_distinct_users_per_bucket(spark):
    from datetime import datetime, timedelta

    from my_crawler_spark.operators.events import retention_cohorts

    d0 = datetime(2026, 1, 5)  # bucket boundary-agnostic: exact integer math
    W = lambda w, u: (u * 100 + w, d0 + timedelta(weeks=w), u)
    rows = [
        W(0, 1), W(0, 1),          # u1 week0 twice -> counts once
        W(1, 1), W(3, 1),          # u1 returns weeks 1 and 3
        W(0, 2),                   # u2 week0 only
        W(1, 3), W(2, 3),          # u3 starts week1 (separate cohort)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long"
    )
    got = {
        (r["cohort"], r["offset"]): (r["active_users"], r["cohort_size"])
        for r in retention_cohorts(ev).collect()
    }
    c0 = min(c for c, _ in got)
    assert got[(c0, 0)] == (2, 2)      # u1+u2 in their own week
    assert got[(c0, 1)] == (1, 2)      # only u1 returns
    assert got[(c0, 3)] == (1, 2)
    assert (c0, 2) not in got          # nobody from cohort0 in week2
    assert got[(c0 + 1, 0)] == (1, 1) and got[(c0 + 1, 1)] == (1, 1)
