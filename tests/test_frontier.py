"""End-to-end: the distributed BSP crawl must match the sequential oracle
exactly — visit order, URL-seen set, metrics, chunks — and must resume from
snapshot checkpoints byte-identically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_crawler_spark.oracle.reference_sim import SyntheticWeb, crawl_request_sim
from my_crawler_spark.plans.crawl_plan import CrawlRunner


def make_runner(spark, fixtures, workdir, **kw) -> CrawlRunner:
    return CrawlRunner(
        spark,
        str(workdir),
        pages=spark.createDataFrame(fixtures["pages"]),
        redirects=spark.createDataFrame(fixtures["redirects"]),
        images=spark.createDataFrame(fixtures["images"]),
        robots_pdf=fixtures["robots"],
        sitemaps_pdf=fixtures["sitemaps"],
        budgets=spark.createDataFrame(fixtures["politeness_budget"]),
        **kw,
    )


def oracle_results(fixtures):
    web = SyntheticWeb(fixtures)
    out = {}
    for s in fixtures["seeds"].itertuples():
        res = crawl_request_sim(
            web, s.request_id, s.url, s.max_pages, s.max_depth, s.same_domain
        )
        if res is not None:
            out[s.request_id] = res
    return out


@pytest.fixture(scope="module")
def crawl(spark, fixtures, tmp_path_factory):
    wd = tmp_path_factory.mktemp("crawl")
    runner = make_runner(spark, fixtures, wd)
    runner.admit_requests(fixtures["seeds"])
    final_round = runner.run(max_rounds=100)
    yield runner, final_round
    runner.close()


def test_visit_order_matches_oracle(crawl, fixtures):
    runner, _ = crawl
    oracle = oracle_results(fixtures)
    got = (
        runner.t_visits.read()
        .orderBy("request_id", "seq")
        .select("request_id", "url", "depth", "outcome")
        .collect()
    )
    by_req: dict[int, list] = {}
    for r in got:
        by_req.setdefault(r.request_id, []).append((r.url, r.depth, r.outcome))
    assert set(by_req) == set(oracle)
    for rid, res in oracle.items():
        want = [(v["url"], v["depth"], v["outcome"]) for v in res.visit_order]
        assert by_req[rid] == want, f"request {rid} visit order diverges"


def test_url_seen_matches_oracle(crawl, fixtures):
    runner, _ = crawl
    oracle = oracle_results(fixtures)
    got = runner.t_seen.read().collect()
    by_req: dict[int, set] = {}
    for r in got:
        by_req.setdefault(r.request_id, set()).add(r.url)
    for rid, res in oracle.items():
        assert by_req.get(rid, set()) == res.url_seen, f"request {rid} seen set"


def test_metrics_match_oracle(crawl, fixtures):
    runner, _ = crawl
    oracle = oracle_results(fixtures)
    m = (
        runner.t_metrics.read()
        .groupBy("request_id")
        .agg(
            *[
                F.sum(c).alias(c)
                for c in ["crawled", "indexed", "failed", "skipped_robots",
                          "skipped_depth", "blocked"]
            ]
        )
        .collect()
    )
    got = {r.request_id: r.asDict() for r in m}
    for rid, res in oracle.items():
        g = got[rid]
        for k, v in res.metrics.items():
            assert g[k] == v, f"request {rid} metric {k}: got {g[k]} want {v}"


def test_chunks_match_oracle(crawl, fixtures):
    runner, _ = crawl
    oracle = oracle_results(fixtures)
    got = runner.t_chunks.read().collect()
    got_set = {
        (r.request_id, r.source_url, r.chunk_index, r.chunk_content, r.page_version,
         r.point_id)
        for r in got
    }
    want_set = set()
    for rid, res in oracle.items():
        for c in res.chunks:
            want_set.add(
                (rid, c["source_url"], c["chunk_index"], c["chunk_content"],
                 c["page_version"], c["point_id"])
            )
    assert got_set == want_set
    # every chunk row has a unit-norm embedding of the right dimension
    emb = runner.t_chunks.read().select(F.size("embedding").alias("d")).distinct().collect()
    assert {r.d for r in emb} <= {384}


def test_politeness_budget_does_not_change_results(spark, fixtures, tmp_path):
    """Strict-prefix rounds: token budgets are pure pacing (SURVEY §7)."""
    fat = fixtures["politeness_budget"].copy()
    fat["tokens_per_round"] = 1000  # everything in one round
    fx2 = dict(fixtures, politeness_budget=fat)
    with make_runner(spark, fx2, tmp_path / "fat") as runner:
        runner.admit_requests(fixtures["seeds"])
        runner.run(max_rounds=100)
        oracle = oracle_results(fixtures)
        got = (
            runner.t_visits.read()
            .orderBy("request_id", "seq")
            .select("request_id", "url", "outcome")
            .collect()
        )
    by_req: dict[int, list] = {}
    for r in got:
        by_req.setdefault(r.request_id, []).append((r.url, r.outcome))
    for rid, res in oracle.items():
        assert by_req[rid] == [(v["url"], v["outcome"]) for v in res.visit_order]


def test_resume_mid_crawl(spark, fixtures, tmp_path):
    """Kill after round 2, build a fresh runner on the same workdir, finish:
    final state must equal an uninterrupted run."""
    wd = tmp_path / "resume"
    r1 = make_runner(spark, fixtures, wd)
    try:
        r1.admit_requests(fixtures["seeds"])
        r1.run_round(1)
        r1.run_round(2)
    finally:
        r1.close()
    del r1
    with make_runner(spark, fixtures, wd) as r2:  # fresh driver, state from snapshots
        r2.run(max_rounds=100)
        oracle = oracle_results(fixtures)
        got = (
            r2.t_visits.read()
            .orderBy("request_id", "seq")
            .select("request_id", "url", "outcome")
            .collect()
        )
    by_req: dict[int, list] = {}
    for r in got:
        by_req.setdefault(r.request_id, []).append((r.url, r.outcome))
    for rid, res in oracle.items():
        assert by_req[rid] == [(v["url"], v["outcome"]) for v in res.visit_order]
