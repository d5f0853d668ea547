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
        ("Tue, 14 Nov 2023 22:13:20 GMT", 0),    # NOW, delta 0
        ("Tue, 14 Nov 2023 22:12:20 GMT", 0),    # past -> clamp 0
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
