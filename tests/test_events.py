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
