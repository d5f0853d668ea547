from __future__ import annotations

import pytest

from my_crawler_spark.operators.urlquality import url_quality


@pytest.fixture(scope="module")
def fixture_urls(spark):
    rows = [
        (1, "https://good.example.com/blog/post1"),
        (2, "https://good.example.com/login/form"),  # spam word 0.6
        (3, "https://bad.example.com/about"),  # blocklisted domain
        (4, "https://good.example.com/files/doc.pdf"),  # file ext + 0.4
        (5, "https://good.example.com/"),
    ]
    return spark.createDataFrame(rows, "key long, url string")


def test_url_quality_gates(spark, fixture_urls):
    bl = spark.createDataFrame([("bad.example.com",)], "domain string")
    got = {r.key: r for r in url_quality(fixture_urls, bl).collect()}
    assert got[1].keep and got[1].url_score == pytest.approx(0.1)
    assert not got[2].keep and got[2].url_score == pytest.approx(0.6)
    assert not got[3].keep and got[3].blocked
    assert not got[4].keep  # file extension gate (score 0.4 alone would pass)
    assert got[5].keep and got[5].url_score == 0.0


def test_url_quality_plan_is_broadcast_join_no_python(spark, fixture_urls):
    bl = spark.createDataFrame([("bad.example.com",)], "domain string")
    plan = (
        url_quality(fixture_urls, bl)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan
