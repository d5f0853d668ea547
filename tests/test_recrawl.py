"""Freshness-aware recrawl scheduling: hand model + tie-break totality."""

from __future__ import annotations

from my_crawler_spark.operators.recrawl import change_history, recrawl_schedule

DAY_US = 86_400_000_000


def _visits(spark, rows):
    return spark.createDataFrame(
        rows, ["page_id", "ts", "sig", "visit_id"]
    )


def test_recrawl_hand_model(spark):
    rows = [
        # page 1: three visits a day apart, signature changes twice
        (1, 0, 10, 1),
        (1, DAY_US, 11, 2),
        (1, 2 * DAY_US, 12, 3),
        # page 2: a single visit -> prior-only rate 0.5/day, interval 2d
        (2, 0, 7, 4),
    ]
    now = 3 * DAY_US
    got = {r.page_id: r for r in recrawl_schedule(_visits(spark, rows), now=now).collect()}

    p1 = got[1]
    assert (p1.n_visits, p1.n_changes) == (3, 2)
    assert p1.rate_per_day == round((2 + 0.5) / (2.0 + 1.0), 6)  # 0.833333
    assert p1.interval_days == round(1.0 / p1.rate_per_day, 6)  # 1.2
    assert p1.next_due == 2 * DAY_US + int(86_400_000_000 * 1.2)
    assert p1.overdue == now - p1.next_due and not p1.due_now  # due at 3.2d

    p2 = got[2]
    assert (p2.n_visits, p2.n_changes) == (1, 0)
    assert p2.rate_per_day == 0.5 and p2.interval_days == 2.0
    assert p2.next_due == 2 * DAY_US and p2.due_now and p2.overdue == DAY_US


def test_recrawl_clamps_and_tiebreak(spark):
    rows = [
        # page 3: flips EVERY visit over a short span -> rate 4.5/day,
        # 1/rate = 0.22d -> interval clamps at the 0.25d floor
        (3, 0, 1, 1),
        (3, 1_000_000, 2, 2),
        (3, 2_000_000, 3, 3),
        (3, 3_000_000, 4, 8),
        (3, 4_000_000, 5, 9),
        # page 4: never changes over a long span -> interval clamps at max
        (4, 0, 5, 4),
        (4, 60 * DAY_US, 5, 5),
        # page 5: two visits at the SAME timestamp -> visit_id orders them;
        # sig differs so it must count exactly one change, not zero or two
        (5, 0, 1, 7),
        (5, 0, 2, 6),
    ]
    got = {r.page_id: r for r in recrawl_schedule(_visits(spark, rows), now=0).collect()}
    assert got[3].interval_days == 0.25
    assert got[4].interval_days == 30.0
    h = {r.page_id: r for r in change_history(_visits(spark, rows)).collect()}
    assert h[5].n_changes == 1


def test_snapshot_diff_classifies_all_four_states(spark):
    from my_crawler_spark.operators.recrawl import snapshot_diff

    old = spark.createDataFrame(
        [("a", "v1"), ("b", "v1"), ("c", "v1"), ("n", None)],
        "url string, page_version string",
    )
    new = spark.createDataFrame(
        [("a", "v1"), ("b", "v2"), ("d", "v1"), ("n", None)],
        "url string, page_version string",
    )
    got = {r["key"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "a": "unchanged",
        "b": "changed",
        "c": "removed",
        "d": "added",
        "n": "unchanged",  # NULL versions both sides: presence-only compare
    }
