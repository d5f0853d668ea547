"""Search-side operator tests (R1-R10) — mirrors api/src/main.rs:450-626 and
api/src/ranking.rs:231-432 behavior tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from my_crawler_spark.operators import search as S


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark engine for big data processing", "https://spark.example.com/"),
        (2, "the data engine", "https://a.example.com/docs/engine"),
        (3, "spark spark spark engine", "https://b.example.com/blog/spark"),
        (4, "unrelated gardening tips", "https://g.example.com/tips"),
        (5, "spark engine", "https://spark.example.com/"),  # dup url of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "url"])


def test_bm25_ranks_tf_and_idf(spark, docs):
    got = {r.doc_id: r.bm25 for r in S.bm25_scores(docs, "spark engine").collect()}
    assert 4 not in got  # no query terms
    assert got[3] > got[2]  # more tf on 'spark', both have 'engine'
    assert all(v > 0 for v in got.values())


def test_bm25_empty_query(spark, docs):
    assert S.bm25_scores(docs, "!!!").count() == 0


def test_cosine_and_dense_scores(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    got = {r.vec_id: r.cos for r in S.dense_scores(emb, [1.0, 0.0]).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0)
    assert got[3] == pytest.approx(1 / math.sqrt(2))


def test_rrf_weights(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], ["id", "rank"])
    b = spark.createDataFrame([(2, 1), (1, 2)], ["id", "rank"])
    fused = {r.id: r.rrf_score for r in S.rrf_fuse([(a, 2.0), (b, 1.0)], "id").collect()}
    # id1: 2/(60+1)+1/(60+2); id2: 2/(60+2)+1/(60+1)
    assert fused[1] == pytest.approx(2 / 61 + 1 / 62)
    assert fused[2] == pytest.approx(2 / 62 + 1 / 61)
    assert fused[1] > fused[2]


def test_ranking_boosts_constants(spark):
    df = spark.createDataFrame(
        [(0.0, "https://spark.example.com/", "spark engine"),
         (0.0, "https://a.example.com/a/b/c", "nothing here")],
        ["score", "source_url", "page_title"],
    )
    got = S.apply_ranking_boosts(df, "spark engine").collect()
    by_url = {r.source_url: r.score for r in got}
    root = by_url["https://spark.example.com/"]
    # root: 0.5/26 + 1.25 (root) + 2.0 (root-host match) + 3.0*coverage(1.0)
    assert root == pytest.approx(0.5 / 26 + 1.25 + 2.0 + 3.0, rel=1e-6)
    deep = by_url["https://a.example.com/a/b/c"]
    assert deep == pytest.approx(0.5 / 27 - 3 * 0.12 + 0.0, rel=1e-6)


def test_popularity_boost_curve(spark):
    df = spark.createDataFrame(
        [(0.0, "https://h1.example.com/x/y", "t")], ["score", "source_url", "page_title"]
    )
    ranks = spark.createDataFrame([(1, "h1.example.com")], ["rank", "domain"])
    got = S.apply_ranking_boosts(df, "zzz", ranks_dim=ranks).collect()[0]
    # rank 1 -> boost 1.0; plus url-len and depth terms
    assert got.score == pytest.approx(0.5 / 26 - 2 * 0.12 + 1.0, rel=1e-5)


def test_unique_pages_diversified(spark):
    # mirrors main.rs:495-517: dedup then first-5 distinct hosts first
    rows = [
        (1, "https://a.com/1"),
        (2, "https://a.com/2"),
        (3, "https://a.com/1"),  # dup url, worse rank -> dropped
        (4, "https://b.com/1"),
        (5, "https://c.com/1"),
    ]
    df = spark.createDataFrame(rows, ["rank", "source_url"])
    got = S.unique_pages_diversified(df).orderBy("out_rank").collect()
    urls = [r.source_url for r in got]
    assert urls == [
        "https://a.com/1",  # first a.com
        "https://b.com/1",
        "https://c.com/1",
        "https://a.com/2",  # non-diverse follows in rank order
    ]


def test_paginate_after_dedup(spark):
    rows = [(i, f"https://h{i}.com/") for i in range(1, 8)]
    df = S.unique_pages_diversified(spark.createDataFrame(rows, ["rank", "source_url"]))
    page2 = S.paginate(df, limit=2, offset=2).orderBy("out_rank").collect()
    assert [r.source_url for r in page2] == ["https://h3.com/", "https://h4.com/"]


def test_knowledge_panel_rules(spark):
    df = spark.createDataFrame(
        [(1, "Real Title", "A description", "https://a.com/")],
        ["out_rank", "page_title", "description", "source_url"],
    )
    assert S.knowledge_panel(df).count() == 1
    bad = spark.createDataFrame(
        [(1, "No Title", "d", "https://a.com/"), (1, "T", "", "https://b.com/")],
        ["out_rank", "page_title", "description", "source_url"],
    )
    assert S.knowledge_panel(bad).count() == 0


def test_plagiarism_threshold(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    got = S.plagiarism_check(emb, [1.0, 0.0], threshold=0.6).collect()
    assert {r.vec_id for r in got} == {1, 2}


def test_inverted_postings_impact_order_and_pruning(spark):
    from my_crawler_spark.operators.search import inverted_postings

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana"),
            (2, "apple banana banana"),
            (3, "apple cherry"),
        ],
        "doc_id long, text string",
    )
    full = {r["term"]: r.asDict() for r in inverted_postings(docs).collect()}
    assert full["apple"]["df"] == 3 and full["apple"]["total_tf"] == 5
    # impact order: tf desc, doc asc on ties
    assert [(p["doc"], p["tf"]) for p in full["apple"]["postings"]] == [
        (1, 3),
        (2, 1),
        (3, 1),
    ]
    assert [(p["doc"], p["tf"]) for p in full["banana"]["postings"]] == [
        (2, 2),
        (1, 1),
    ]
    pruned = {
        r["term"]: r.asDict()
        for r in inverted_postings(docs, max_postings=1).collect()
    }
    # stats still see the FULL corpus; only the list tail is cut
    assert pruned["apple"]["df"] == 3 and pruned["apple"]["total_tf"] == 5
    assert [(p["doc"], p["tf"]) for p in pruned["apple"]["postings"]] == [(1, 3)]


def test_refresh_postings_equals_full_rebuild(spark):
    from my_crawler_spark.operators.recrawl import snapshot_diff
    from my_crawler_spark.operators.search import inverted_postings, refresh_postings

    import pyspark.sql.functions as F

    old = spark.createDataFrame(
        [
            ("1", "apple banana apple"),
            ("2", "banana cherry"),
            ("3", "date elder date date"),
            ("4", "fig grape"),
        ],
        "doc_id string, text string",
    )
    # 2 removed, 3 changed (loses 'elder', gains 'apple'), 5 added
    new = spark.createDataFrame(
        [
            ("1", "apple banana apple"),
            ("3", "date apple date date"),
            ("4", "fig grape"),
            ("5", "cherry honeydew"),
        ],
        "doc_id string, text string",
    )
    ver = lambda df: df.select(
        F.col("doc_id").alias("url"),
        F.substring(F.sha2(F.col("text"), 256), 1, 12).alias("page_version"),
    )
    diff = snapshot_diff(ver(old), ver(new))
    for cap in (0, 2):
        idx = inverted_postings(old, max_postings=cap)
        got = refresh_postings(idx, old, new, diff, max_postings=cap)
        want = inverted_postings(new, max_postings=cap)
        as_map = lambda df: {
            r["term"]: (r["df"], r["total_tf"], [(p["doc"], p["tf"]) for p in r["postings"]])
            for r in df.collect()
        }
        assert as_map(got) == as_map(want)
