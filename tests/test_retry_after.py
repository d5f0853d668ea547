"""Retry-After header parsing: delta-seconds AND HTTP-date forms
(web_visitor.rs:255-262), garbage -> NULL (treated as header absent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_crawler_spark.operators.fetch import retry_after_seconds

NOW = 1_700_000_000


def test_retry_after_both_forms(spark):
    rows = [
        ("0", 0),
        ("120", 120),
        ("Tue, 14 Nov 2023 22:14:20 GMT", 60),   # NOW + 60
        ("Tue, 14 Nov 2023 22:13:20 GMT", 0),    # NOW, delta 0 -> Some(0)
        ("Tue, 14 Nov 2023 22:12:20 GMT", None), # past -> None (backoff)
        ("soon", None),                          # unparseable -> absent
        ("14 Nov 2023", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(h,) for h, _ in rows], "header string"
    ).select(
        "header", retry_after_seconds(F.col("header"), F.lit(NOW)).alias("d")
    )
    got = {r.header: r.d for r in df.collect()}
    for h, want in rows:
        assert got[h] == want, (h, got[h], want)


def test_retry_token_cost_tri_state(spark):
    """Some(0) vs None (ADVICE r3): an explicit 'Retry-After: 0' sleeps 0 s
    between attempts (cost = attempts), while an ABSENT header (NULL) falls
    back to exponential backoff 1s+2s (web_visitor.rs:161)."""
    from my_crawler_spark.operators.fetch import retry_token_cost

    rows = [
        # (flaky_fail_times, retry_after_s, want_cost)
        (0, None, 1),   # healthy: 1 attempt, no delay either way
        (0, 0, 1),
        (2, None, 3 + 1),  # 3 attempts + floor((1+2)/2) backoff tokens
        (2, 0, 3 + 0),     # explicit 0: sleeps 0, NO backoff
        (2, 4, 3 + 4),     # 3 attempts + floor((4+4)/2)
        (1, None, 2),      # 2 attempts + floor(1/2)
        (1, 0, 2),
        (1, 3, 2 + 1),     # 2 attempts + floor(3/2)
    ]
    df = spark.createDataFrame(
        [(f, ra) for f, ra, _ in rows], "flaky int, ra int"
    ).select(
        "flaky", "ra",
        retry_token_cost(F.col("flaky"), F.col("ra")).alias("cost"),
    )
    got = {(r.flaky, r.ra): r.cost for r in df.collect()}
    for f, ra, want in rows:
        assert got[(f, ra)] == want, (f, ra, got[(f, ra)], want)
