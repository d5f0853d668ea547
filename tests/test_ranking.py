"""global_rank / allocate_host_budget / anchor_text_profiles /
dedup_paragraphs — the round-4 crawl-scheduling + curation additions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_crawler_spark.operators.dedup import dedup_paragraphs
from my_crawler_spark.operators.graph import anchor_text_profiles
from my_crawler_spark.operators.ranking import allocate_host_budget, global_rank


def test_global_rank_matches_global_window(spark):
    """The range-partitioned rank must equal row_number() over the
    single-task global window on a shuffled, many-partition input."""
    rows = [(i, (i * 37) % 101, f"k{i:03d}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, score long, key string").repartition(
        7
    )
    got = global_rank(df, [F.desc("score"), F.asc("key")], num_partitions=5)
    want = df.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("key")))
        .cast("long"),
    )
    assert got.count() == 500
    diff = got.select("id", "rank").exceptAll(want.select("id", "rank"))
    assert diff.count() == 0
    got.unpersist()


def test_global_rank_plan_has_no_single_partition_exchange(spark):
    df = spark.createDataFrame(
        [(i, i % 13) for i in range(100)], "id long, score long"
    )
    ranked = global_rank(df, [F.desc("score"), F.asc("id")], num_partitions=4)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan.lower(), plan
    ranked.unpersist()


def test_host_budget_hand_case(spark):
    """Textbook Hamilton: budget 10 over weights 5/3/2 with a remainder
    round — exact integer arithmetic, Σ allocated == budget."""
    hosts = spark.createDataFrame(
        [("a", 47), ("b", 33), ("c", 20)], "host string, weight long"
    )
    out = {
        r["host"]: r.asDict()
        for r in allocate_host_budget(hosts, 10).collect()
    }
    # quotas: 4.7 / 3.3 / 2.0 -> base 4/3/2, leftover 1 goes to 'a' (.7)
    assert out["a"]["allocated"] == 5
    assert out["b"]["allocated"] == 3
    assert out["c"]["allocated"] == 2
    assert sum(v["allocated"] for v in out.values()) == 10
    assert out["a"]["rank"] == 1


def test_host_budget_sum_exact_on_skew(spark):
    """A pathological weight skew (one host owns ~99% of mass) must still
    sum exactly to the budget and give every host a non-negative quota."""
    rows = [("big", 990_000)] + [(f"h{i}", 7) for i in range(137)]
    hosts = spark.createDataFrame(rows, "host string, weight long")
    got = allocate_host_budget(hosts, 12_345).agg(
        F.sum("allocated").alias("s"), F.min("allocated").alias("m")
    ).collect()[0]
    assert got["s"] == 12_345
    assert got["m"] >= 0


def test_anchor_text_profiles_hand_graph(spark):
    links = spark.createDataFrame(
        [
            (1, 100, "docs"),
            (2, 100, "docs"),
            (3, 100, "blog"),
            (4, 100, "api"),  # tie on count=1 with blog -> 'docs' still top
            (5, 200, "home"),
        ],
        "src long, dst long, anchor string",
    )
    out = {r["dst"]: r.asDict() for r in anchor_text_profiles(links).collect()}
    assert out[100]["n_links"] == 4
    assert out[100]["n_anchors"] == 3
    assert out[100]["top_anchor"] == "docs"
    assert out[100]["top_anchor_links"] == 2
    assert out[100]["anchors"] == "api|blog|docs"
    assert out[200]["top_anchor"] == "home" and out[200]["n_links"] == 1


def test_anchor_top_tie_breaks_lexicographically(spark):
    links = spark.createDataFrame(
        [(1, 7, "zeta"), (2, 7, "alpha")], "src long, dst long, anchor string"
    )
    row = anchor_text_profiles(links).collect()[0]
    assert row["top_anchor"] == "alpha" and row["top_anchor_links"] == 1


def test_dedup_paragraphs_keeps_first_occurrence_only(spark):
    banner = "Cookie notice: please accept."
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique one\nFooter 2024"),
            (2, f"{banner}\nunique two\nFooter 2019"),  # footer differs only
            (3, f"{banner}\nunique three"),  # by digits -> same key
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in dedup_paragraphs(docs).collect()}
    # doc 1 keeps everything (first occurrence of banner AND footer)
    assert out[1]["n_kept"] == 3
    assert out[1]["clean_text"] == f"{banner}\nunique one\nFooter 2024"
    # doc 2 loses the banner and the digit-variant footer (CCNet norm key)
    assert out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == "unique two"
    # doc 3 loses only the banner
    assert out[3]["n_kept"] == 1
    assert out[3]["clean_text"] == "unique three"


def test_dedup_paragraphs_blank_lines_dropped_and_empty_doc_survives(spark):
    docs = spark.createDataFrame(
        [(1, "keep me\n\n   \n42 17"), (2, "keep me")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in dedup_paragraphs(docs).collect()}
    # blank + digit-only paragraphs normalize empty -> never counted
    assert out[1]["n_paragraphs"] == 1 and out[1]["n_kept"] == 1
    # doc 2's only paragraph is a corpus dup -> doc still appears, empty
    assert out[2]["n_kept"] == 0 and out[2]["clean_text"] == ""


def test_balanced_shards_serpentine_balance(spark):
    """Shard totals under serpentine assignment stay within one max-item of
    each other, and every row lands in exactly one shard."""
    from my_crawler_spark.operators.sampling import balanced_shards

    rows = [(i, ((i * 131) % 997) + 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_bytes long")
    out = balanced_shards(df, 8)
    per = {
        r["shard"]: r["total"]
        for r in out.groupBy("shard")
        .agg(F.sum("n_bytes").alias("total"))
        .collect()
    }
    assert sorted(per) == list(range(8))
    assert out.count() == 400
    max_item = max(s for _, s in rows)
    assert max(per.values()) - min(per.values()) <= max_item
    # spot-check the serpentine rule on the first two passes
    first16 = {
        r["rank"]: r["shard"]
        for r in out.filter(F.col("rank") <= 16).collect()
    }
    assert [first16[r] for r in range(1, 17)] == list(range(8)) + list(
        range(7, -1, -1)
    )
