"""HLL++ approx-distinct sketch: production plan shape + soundness band."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_crawler_spark.operators.sketches import (
    approx_distinct,
    approx_distinct_violations,
)


def _events(spark):
    rows = [(i, "host-%d" % (i % 7), "u-%d" % (i % 53)) for i in range(2000)]
    return spark.createDataFrame(rows, ["event_id", "host", "user_id"])


def test_approx_distinct_near_exact_on_small_groups(spark):
    df = _events(spark)
    got = {r.host: r.n_approx for r in approx_distinct(df, ["host"], "user_id").collect()}
    exact = {
        r.host: r.n
        for r in df.groupBy("host").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(got) == set(exact)
    for h, n in exact.items():
        assert abs(got[h] - n) <= max(0.2 * n, 2)


def test_violations_empty_and_checker_not_vacuous(spark):
    df = _events(spark)
    assert approx_distinct_violations(df, ["host"], "user_id").count() == 0
    # the checker itself must be falsifiable: a zero-width band fires
    assert (
        approx_distinct_violations(df, ["host"], "user_id", tol_sigmas=0.0, abs_slack=0).count()
        > 0
    )
    # ... and an empty input is reported as vacuous, not silently green
    empty = approx_distinct_violations(df.limit(0), ["host"], "user_id").collect()
    assert [r.violation for r in empty] == ["vacuous_grouping"]


def test_production_plan_has_no_expand_and_no_python(spark):
    plan = (
        approx_distinct(_events(spark), ["host"], "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("Expand", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


def test_approx_quantiles_in_exact_band(spark):
    from my_crawler_spark.operators.sketches import (
        approx_quantile_violations,
        approx_quantiles,
    )

    rows = [(i, "g%d" % (i % 3), float((i * 7919) % 1000)) for i in range(3000)]
    df = spark.createDataFrame(rows, ["i", "g", "v"])
    assert approx_quantile_violations(df, ["g"], "v").count() == 0
    got = {(r.g, r.prob): r.q_approx for r in approx_quantiles(df, ["g"], "v").collect()}
    import numpy as np

    vals = sorted(v for _, g, v in rows if g == "g0")
    assert abs(got[("g0", 0.5)] - np.percentile(vals, 50)) <= 5.0
    empty = approx_quantile_violations(df.limit(0), ["g"], "v").collect()
    assert [r.violation for r in empty] == ["vacuous_grouping"]


# --- count-min sketch -------------------------------------------------------

def _docs(spark):
    # skewed corpus: "hot" appears 400x, "warm" 50x, tail terms once each
    rows = [(i, "hot " * 4 + "warm" if i < 100 else f"tail{i} once") for i in range(150)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cms_never_underestimates_and_heavy_hitters_exact(spark):
    from my_crawler_spark.operators.sketches import cms_violations, heavy_hitters

    d = _docs(spark)
    assert cms_violations(d, width=64).count() == 0  # tight width -> collisions, still sound
    hh = {r.term: r.n for r in heavy_hitters(d, threshold=100).collect()}
    assert hh == {"hot": 400, "warm": 100}  # "once" (50x) stays below
    hh2 = {r.term: r.n for r in heavy_hitters(d, threshold=101).collect()}
    assert hh2 == {"hot": 400}  # threshold is inclusive-boundary exact


def test_cms_estimate_collision_overestimates_only(spark):
    from my_crawler_spark.operators.sketches import cms_build, cms_estimate

    d = _docs(spark)
    from my_crawler_spark.operators.dedup import tokens
    exact = (
        d.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    )
    sk = cms_build(exact, width=16)  # 16 buckets for ~52 terms: heavy collisions
    est = cms_estimate(exact, sk, width=16)
    j = exact.join(est, "term").collect()
    assert all(r.est_n >= r.n for r in j)
    assert any(r.est_n > r.n for r in j)  # collisions actually exercised
