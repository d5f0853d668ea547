from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_crawler_spark.operators import textstats as TS


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox is that it for a dog in the fog", "en"),
        (2, "der schnelle braune fuchs und die katze ist auf den tisch", "de"),
        (3, "le renard brun et les chiens dans la maison est une chose", "fr"),
        (4, "el zorro y los perros en la casa que es de un gato", "es"),
        (5, "敏捷的棕色狐狸跳过懒狗数据表格引擎流处理分析", "zh"),
        (6, "zzz qqq xxx", "und"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_lang_id_accuracy(spark, docs):
    got = docs.select("lang", TS.lang_id_expr(F.col("text")).alias("g")).collect()
    for r in got:
        assert r.g == r.lang, r


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world, 42 times!",)], ["text"])
    r = df.select(
        TS.ws_token_count(F.col("text")).alias("ws"),
        TS.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r.ws == 4
    # hello | world | , | 42 | times | !
    assert r.bpe == 6


def test_quality_score_bounds(spark, docs):
    vals = [r.q for r in docs.select(TS.quality_score_expr(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    # long clean english text beats garbage
    df = spark.createDataFrame(
        [("the data engine is that it for " * 20,), ("!!!###$$$%%%^^^&&&" * 10,)],
        ["text"],
    )
    a, b = [r.q for r in df.select(TS.quality_score_expr(F.col("text")).alias("q")).collect()]
    assert a > b


def test_fingerprint_deterministic(spark, docs):
    f1 = {r.doc_id: r.fingerprint for r in TS.doc_fingerprint(docs).collect()}
    f2 = {r.doc_id: r.fingerprint for r in TS.doc_fingerprint(docs).collect()}
    assert f1 == f2
    assert len(set(f1.values())) == len(f1)  # distinct docs -> distinct fps


def test_repetition_stats(spark):
    """A looping doc reads high on every repetition signal; a diverse doc
    reads low; a short doc hits the guards (no 8-grams -> 0.0)."""
    loop = "spam ham " * 20                       # 40 tokens, 2 distinct
    varied = " ".join(f"w{i}" for i in range(40))  # 40 tokens, all distinct
    rows = [(1, loop), (2, varied), (3, "tiny doc")]
    got = {
        r.doc_id: r
        for r in TS.repetition_stats(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got[1].unique_token_frac == round(2 / 40, 6)
    # "spam ham" occurs 20x, "ham spam" 19x -> top 2-gram covers 40/40 tokens
    assert got[1].top2gram_frac == 1.0
    # 33 8-grams, only 2 distinct (alternating phase)
    assert got[1].dup_8gram_frac == round(1 - 2 / 33, 6)
    assert got[2].unique_token_frac == 1.0
    assert got[2].top2gram_frac == round(2 / 40, 6)  # every 2-gram unique
    assert got[2].dup_8gram_frac == 0.0
    assert got[3].n_tokens == 2 and got[3].dup_8gram_frac == 0.0
    assert got[3].top2gram_frac == 1.0  # its single 2-gram covers both tokens


def test_pii_scrub(spark):
    rows = [
        (1, "reach me at jane.doe+x@mail-host.org or call +1 555-123-4567 ok"),
        (2, "server at 192.168.1.200 and 10.0.0.1 responded"),
        (3, "nothing sensitive here at all"),
    ]
    got = {
        r.doc_id: r
        for r in TS.pii_scrub(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert (got[1].n_emails, got[1].n_phones, got[1].n_ips) == (1, 1, 0)
    assert got[1].scrubbed == "reach me at <EMAIL> or call <PHONE> ok"
    assert (got[2].n_emails, got[2].n_phones, got[2].n_ips) == (0, 0, 2)
    assert got[2].scrubbed == "server at <IP> and <IP> responded"
    assert got[3].scrubbed == rows[2][1] and got[3].n_emails == 0


def test_winnow_fingerprints_guarantee(spark):
    """The winnowing guarantee: two docs sharing a run of >= k+window-1
    (= 8) tokens share at least one fingerprint; distinct docs share none;
    sub-k docs emit nothing."""
    from my_crawler_spark.operators.textstats import winnow_fingerprints

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " one two three four five"),
            (2, "prefix words here " + shared),
            (3, "entirely different vocabulary nothing common at all whatsoever"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=5, window=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fingerprint"
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    assert 4 not in by_doc
    # storage bound: picks per doc <= number of full windows
    assert all(len(v) <= 20 for v in by_doc.values())


def test_tfidf_top_terms_hand_model(spark):
    import math

    from my_crawler_spark.operators.textstats import tfidf_top_terms

    rows = [
        (1, "apple apple banana cherry"),
        (2, "banana cherry cherry cherry"),
        (3, "apple durian durian elderberry"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_id, r.rk): r for r in tfidf_top_terms(docs, k=2).collect()}

    def idf(df):
        return round(math.log(4.0 / (df + 1)) + 1.0, 9)

    # doc 2: cherry tf=3 df=2 beats banana tf=1
    assert got[(2, 1)].term == "cherry"
    assert got[(2, 1)].score == round(3 * idf(2), 6)
    # doc 3: durian tf=2 df=1 is the rarest-and-densest term
    assert got[(3, 1)].term == "durian"
    assert got[(3, 1)].score == round(2 * idf(1), 6)
    # k bound respected
    assert all(rk <= 2 for _, rk in got)


def test_classifier_scores_hand_model(spark):
    """Two tokens with KNOWN buckets/weights -> exact logit/prob."""
    import hashlib
    import math

    w = TS.hash_feature_weights(spark)
    wmap = {r.bucket_hex: r.w_milli for r in w.collect()}
    # independently recompute: bucket = first 3 hex of sha256, weight table rule
    for b, wm in list(wmap.items())[:5]:
        assert wm == (int(b, 16) * 2654435761) % 1000 - 500
    docs = spark.createDataFrame([(1, "alpha beta alpha")], ["doc_id", "text"])
    got = TS.classifier_scores(docs, w).collect()[0]
    mk = lambda t: wmap[hashlib.sha256(t.encode()).hexdigest()[:3]]
    s = 2 * mk("alpha") + mk("beta")
    logit = round(s / (1000.0 * 3), 6)
    assert got.n_tokens == 3
    assert got.logit == logit
    assert got.prob == round(1 / (1 + math.exp(-logit)), 6)
    assert got.keep == (got.prob >= 0.5)


def test_normalize_corpus_nfc_and_whitespace(spark):
    docs = spark.createDataFrame(
        [(1, "a\tb\r\n  c" + chr(7) + " e" + chr(0x301) + " d "), (2, "clean text")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: (r.norm_text, r.changed) for r in TS.normalize_corpus(docs).collect()}
    assert out[1] == ("a b c é d", True)
    assert out[2] == ("clean text", False)


def test_blocklist_stats_counts_and_keep(spark):
    from my_crawler_spark.operators.textstats import blocklist_stats

    docs = spark.createDataFrame(
        [
            (1, "Buy CHEAP pills, buy cheap now!"),
            (2, "a perfectly clean document"),
            (3, "cheapest is not cheap-adjacent but cheap is"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in blocklist_stats(docs, ["cheap", "pills", "spam"]).collect()
    }
    # case-insensitive token matches, occurrences counted
    assert got[1]["n_hits"] == 3 and got[1]["matched"] == "cheap,pills"
    assert not got[1]["keep"]
    assert got[2]["n_hits"] == 0 and got[2]["matched"] == "" and got[2]["keep"]
    # token-level: 'cheapest' is NOT a hit; hyphen splits tokens so
    # 'cheap-adjacent' contributes a 'cheap' token + the bare 'cheap'
    assert got[3]["n_hits"] == 2 and got[3]["matched"] == "cheap"


def test_pmi_surfaces_planted_collocation(spark):
    import math

    from my_crawler_spark.operators.textstats import pmi_top_pairs

    # "san francisco" always co-occurs; "the" pairs with everything
    docs = spark.createDataFrame(
        [
            (i, f"the san francisco trip {w} the end")
            for i, w in enumerate(["alpha", "beta", "gamma", "delta", "eps"])
        ],
        "doc_id long, text string",
    )
    got = pmi_top_pairs(docs, min_count=5, k=3).collect()
    # 'san francisco' and 'francisco trip' have identical counts -> equal
    # PMI; ties break on (w1, w2) so both outrank every 'the' pair
    top2 = {(r["w1"], r["w2"]) for r in got[:2]}
    assert top2 == {("san", "francisco"), ("francisco", "trip")}
    # python twin of the top score: bcnt=5, c1=c2=5, bt=30, ut=35
    want = round(math.log(5 / 30) - math.log(5 / 35) - math.log(5 / 35), 9)
    assert got[0]["pmi"] == want and got[1]["pmi"] == want
