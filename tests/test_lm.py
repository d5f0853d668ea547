from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from my_crawler_spark.operators.lm import doc_perplexity, perplexity_buckets, unigram_vocab


@pytest.fixture(scope="module")
def docs(spark):
    # common tokens make low-perplexity docs; rare-token docs score high
    rows = [
        (1, "the data engine scans the data table"),
        (2, "the data engine joins the data table"),
        (3, "the data engine sorts the data table"),
        (4, "xylophone quartz obelisk"),
        (5, "zephyr gryphon quasar nebula"),
        (6, "the data table"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_unigram_vocab_counts(spark, docs):
    v = {r.token: r.cnt for r in unigram_vocab(docs).collect()}
    assert v["the"] == 7 and v["data"] == 7 and v["xylophone"] == 1


def test_doc_perplexity_matches_hand_model(spark, docs):
    v = {r.token: r.cnt for r in unigram_vocab(docs).collect()}
    n_total, vocab_n = sum(v.values()), len(v)
    got = {r.doc_id: r for r in doc_perplexity(docs).collect()}

    def hand_ppl(text):
        toks = text.lower().split()
        lps = [round(math.log(v[t] + 1) - math.log(n_total + vocab_n), 9) for t in toks]
        mean = round(sum(lps) / len(lps), 6)
        return round(math.exp(-mean), 4)

    assert got[1].ppl == pytest.approx(hand_ppl(docs.collect()[0].text), abs=1e-9)
    assert got[4].ppl == pytest.approx(hand_ppl("xylophone quartz obelisk"), abs=1e-9)
    # zero-token doc scores NULL
    assert got[7].ppl is None and got[7].n_tokens == 0


def test_rare_docs_score_higher_perplexity(spark, docs):
    got = {r.doc_id: r.ppl for r in doc_perplexity(docs).collect()}
    assert got[4] > got[1] and got[5] > got[2]


def test_buckets_ordered_and_cover(spark, docs):
    # sample everything so thresholds are global percentiles
    out = perplexity_buckets(docs, sample_rate=1.0).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.ppl)
    assert set(by_bucket) >= {"head", "tail"}
    assert max(by_bucket["head"]) <= min(by_bucket["tail"])
    assert by_bucket[None] == [None]  # the empty doc is unscorable


def test_bucket_plan_has_no_python_stage(spark, docs):
    plan = perplexity_buckets(docs)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan
