"""Dedup suite: exact, jaccard, minhash-LSH recall, simhash, embedding."""

from __future__ import annotations

import itertools
import re

import pytest
from pyspark.sql import functions as F

from my_crawler_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup
        (4, "completely different text about spark dataframes and shuffles here"),
        (5, "THE  Quick brown fox jumps over the lazy dog and runs far away today"),  # ws/case dup
        (6, "short"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_jaccard(a: str, b: str, n: int) -> float:
    def sh(t):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B) if A | B else 0.0


def test_exact_duplicates(spark, docs):
    got = D.exact_duplicates(docs).collect()
    ids = {r.doc_id for r in got}
    assert ids == {1, 2, 5}  # whitespace/case-normalized
    assert all(r.canonical_id == 1 for r in got)


def test_jaccard_matches_python(spark, docs):
    got = {(r.id_a, r.id_b): r.jaccard for r in
           D.jaccard_pairs(docs, n=3, threshold=0.3, max_doc_freq=None).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    for (a, b) in itertools.combinations(sorted(texts), 2):
        want = _py_jaccard(texts[a], texts[b], 3)
        if want >= 0.3:
            assert got[(a, b)] == pytest.approx(want, rel=1e-6), (a, b)
        else:
            assert (a, b) not in got


def test_minhash_lsh_recall(spark, docs):
    exact = D.jaccard_pairs(docs, n=3, threshold=0.5, max_doc_freq=None)
    lsh = D.near_duplicates_minhash(docs, n=3, threshold=0.5, bands=16, rows_per_band=4)
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    lsh_pairs = {(r.id_a, r.id_b) for r in lsh.collect()}
    # LSH verified with exact jaccard: no false positives; high-sim recall
    assert lsh_pairs <= exact_pairs
    assert len(lsh_pairs) >= len(exact_pairs) * 0.6


def test_simhash_near_duplicates(spark, docs):
    got = {(r.id_a, r.id_b) for r in
           D.simhash_near_duplicates(docs, max_hamming=3, blocks=4).collect()}
    assert (1, 2) in got  # identical docs: hamming 0
    sh = {r.doc_id: r.simhash for r in D.simhash64(docs).collect()}
    assert sh[1] == sh[2]
    assert sh[1] != sh[4]


def test_embedding_near_duplicates(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.99, 0.01], 0), (3, [0.0, 1.0], 0),
         (4, [1.0, 0.0], 1)],
        ["vec_id", "embedding", "label"],
    )
    got = {(r.id_a, r.id_b) for r in
           D.embedding_near_duplicates(emb, threshold=0.95, block_col="label").collect()}
    assert got == {(1, 2)}  # 3 dissimilar; 4 in another block


def test_embedding_near_duplicates_lsh_blocked(spark):
    """The SRP-LSH-blocked path (the 100 TB shape: no crossJoin) must find
    the same high-cosine pairs as the exact quadratic baseline — near-dup
    pairs are near-parallel, so they collide in >= 1 bucket table with
    overwhelming probability at these (bits, tables)."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    for i in range(60):
        v = rng.standard_normal(16)
        rows.append((2 * i, (v / np.linalg.norm(v)).tolist()))
        # a deliberate near-duplicate of each vector
        w = v + rng.standard_normal(16) * 0.02
        rows.append((2 * i + 1, (w / np.linalg.norm(w)).tolist()))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    import pytest

    with pytest.raises(ValueError, match="allow_quadratic"):
        D.embedding_near_duplicates(emb, threshold=0.97)
    exact = {(r.id_a, r.id_b) for r in
             D.embedding_near_duplicates(
                 emb, threshold=0.97, allow_quadratic=True
             ).collect()}
    lsh = {(r.id_a, r.id_b) for r in
           D.embedding_near_duplicates(
               emb, threshold=0.97, lsh_dim=16, lsh_bits=6, lsh_tables=8
           ).collect()}
    assert lsh <= exact  # exact-cosine verify: no false positives
    planted = {(2 * i, 2 * i + 1) for i in range(60)} & exact
    assert len(lsh & planted) >= 0.9 * len(planted)


def test_ngram_contamination(spark):
    """Verbatim-slice evals flag their source doc (and nothing else);
    vocabulary-sharing but reordered evals do not fire; the threshold
    drops marginal single-shingle overlaps."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa"
    docs = spark.createDataFrame(
        [
            (1, base + " quebec romeo sierra tango"),
            (2, "uniform victor whiskey xray yankee zulu one two three four five six seven eight nine ten"),
            (3, "totally different words everywhere nothing shared here at all in this document text body"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [
            (10, " ".join(base.split()[2:13])),            # verbatim slice of doc 1
            (11, " ".join(reversed(base.split()))),         # same vocab, reversed
            (12, "one two three four five six seven eight"),  # verbatim slice of doc 2
        ],
        "eval_id long, text string",
    )
    got = {
        (r.doc_id, r.eval_id): r.n_shared
        for r in D.ngram_contamination(docs, evals, n=5, min_overlap=3).collect()
    }
    assert set(got) == {(1, 10), (2, 12)}
    assert got[(1, 10)] == 11 - 5 + 1  # every 5-gram of the 11-token slice


def test_duplicate_spans_exact_substring(spark):
    """Lee-et-al-style span dedup: a 12-token run shared by two docs yields
    one maximal merged span in each (token indices, end inclusive); a doc
    with an internal repeat fires on itself; unique docs emit nothing."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1 words here"),
            (2, "prefix2 " + shared + " other2 ending2"),
            # internal repeat: the same 8-gram occurs twice within one doc
            (3, "one two three four five six seven eight " * 2 + "nine"),
            (4, "totally different vocabulary nothing shared at all here ok"),
        ],
        "doc_id long, text string",
    )
    from my_crawler_spark.operators.dedup import duplicate_spans

    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicate_spans(docs, window=8).collect()
    }
    # doc 1: windows 0..4 dup (12-token run -> 5 windows), span [0, 11]
    assert (1, 0, 11, 5) in got
    # doc 2: same run shifted by 1 (prefix2), span [1, 12]
    assert (2, 1, 12, 5) in got
    assert any(d == 3 for d, *_ in got)
    assert not any(d == 4 for d, *_ in got)


def test_scrub_duplicate_spans_keeps_first_occurrence(spark):
    """The keeper (first corpus occurrence by (doc_id, pos)) survives
    verbatim; later occurrences lose the whole merged span; untouched
    docs round-trip through tokenization."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1 words here"),
            (2, "prefix2 " + shared + " other2 ending2"),
            (3, "totally different vocabulary nothing shared at all here ok"),
        ],
        "doc_id long, text string",
    )
    from my_crawler_spark.operators.dedup import scrub_duplicate_spans

    got = {r.doc_id: r for r in scrub_duplicate_spans(docs, window=8).collect()}
    # doc 1 holds the first occurrence -> nothing removed
    assert got[1].n_removed == 0
    assert got[1].clean_text == shared + " unique1 tail1 words here"
    # doc 2 loses the 12-token span, keeps its frame
    assert got[2].n_removed == 12
    assert got[2].clean_text == "prefix2 other2 ending2"
    assert got[3].n_removed == 0 and got[3].clean_text.startswith("totally")


def test_semdedup_keeps_farthest_from_centroid(spark):
    """Planted near-identical groups are clustered; exactly one keeper per
    cluster; the keeper is the member with the LOWEST centroid cosine
    (ties by id); singletons are not emitted."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    base = rng.standard_normal((20, 16))
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # two planted groups: near-copies of vectors 0 and 1
    for j, src in [(100, 0), (101, 0), (102, 1)]:
        rows.append((j, [float(x) for x in base[src] + rng.normal(0, 1e-4, 16)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    from my_crawler_spark.operators.dedup import semdedup

    out = semdedup(emb, n_lists=4, threshold=0.95).collect()
    clusters = {}
    for r in out:
        clusters.setdefault(r.cluster_id, []).append(r)
    # the two planted groups surface: {0,100,101} and {1,102}
    sizes = sorted(len(v) for v in clusters.values())
    assert sizes == [2, 3]
    for members in clusters.values():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1
        lo = min((m.cos_centroid, m.vec_id) for m in members)
        assert (keepers[0].cos_centroid, keepers[0].vec_id) == lo
        # all members share the keeper's list (SemDeDup is within-cluster)
        assert len({m.list_id for m in members}) == 1


def test_scrub_spans_removes_all_duplication(spark):
    """Semantic fixed point: after the apply step, re-running detection on
    the cleaned corpus finds (almost) nothing — every duplicated window
    lost all but its keeper occurrence. Boundary-effect re-duplication
    (remnants concatenating into a new duplicated 8-gram) is possible in
    principle; assert it does not happen on the real fixture corpus."""
    from my_crawler_spark.operators.dedup import (
        duplicate_spans,
        scrub_duplicate_spans,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    before = duplicate_spans(docs, window=8).count()
    assert before > 0  # the fixture has duplication to remove
    cleaned = scrub_duplicate_spans(docs, window=8).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    assert duplicate_spans(cleaned, window=8).count() == 0


def test_hard_negative_pairs_band_and_topk(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1 (j=1.0)
        (3, "alpha beta gamma delta something else entirely now"),  # overlaps 1/2
        (4, "gamma delta epsilon zeta other words here too"),  # overlaps 1/2
        (5, "unrelated corpus talking about spark shuffles only"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = D.hard_negative_pairs(docs, n=2, lo=0.05, hi=0.99, k=2, max_doc_freq=None)
    got = {(r.anchor_id, r.negative_id): (r.jaccard, r.rk) for r in out.collect()}
    # exact duplicates (1,2) are excluded by the hi bound
    assert (1, 2) not in got and (2, 1) not in got
    # the isolated doc mines nothing
    assert not any(a == 5 or b == 5 for a, b in got)
    # banded overlaps are mined symmetrically, ranked by jaccard desc
    assert (1, 3) in got and (3, 1) in got and (1, 4) in got
    j_by_rank = sorted(
        ((rk, j) for (a, _), (j, rk) in got.items() if a == 1)
    )
    assert [rk for rk, _ in j_by_rank] == [1, 2]
    assert j_by_rank[0][1] >= j_by_rank[1][1]
    # hand-check one jaccard value against the python twin
    assert got[(1, 3)][0] == pytest.approx(_py_jaccard(rows[0][1], rows[2][1], 2), abs=1e-6)


def test_hard_negative_pairs_respects_k(spark):
    rows = [(i, "shared bigram core text block number %d" % i) for i in range(1, 8)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = D.hard_negative_pairs(docs, n=2, lo=0.01, hi=0.999, k=3, max_doc_freq=None)
    per_anchor = out.groupBy("anchor_id").count().collect()
    assert per_anchor and all(r["count"] <= 3 for r in per_anchor)


def test_semantic_contamination_flags_planted_paraphrase(spark):
    from my_crawler_spark.operators.dedup import semantic_contamination

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.96, 0.28, 0.0]),   # near-copy of eval 100 (cos ~.96)
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    evals = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        "eval_id long, embedding array<float>",
    )
    got = {
        (r["vec_id"], r["eval_id"]): r["cos"]
        for r in semantic_contamination(corpus, evals, threshold=0.9).collect()
    }
    assert set(got) == {(1, 100), (2, 100), (3, 200)}
    assert got[(1, 100)] == 1.0 and 0.9 < got[(2, 100)] < 1.0
    plan = semantic_contamination(corpus, evals)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan  # broadcast-only, no shuffle


def test_fuzzy_pairs_levenshtein_blocking(spark):
    from my_crawler_spark.operators.dedup import fuzzy_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fix"),      # 1 edit from doc 1
            (3, "the quick brown foxes"),    # distance 3 (2 inserts + 1 sub)
            (4, "completely different txt"),  # same-ish length, far away
            (5, "zz"),                        # way shorter, length-pruned
        ],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in fuzzy_pairs(
        docs, prefix_len=40, max_distance=3
    ).collect()}
    assert got[(1, 2)] == 1
    assert (1, 4) not in got and (1, 5) not in got


def test_fuzzy_pairs_finds_cross_band_pairs(spark):
    """The round-4 recall bug: floor(len/5) banding silently dropped true
    pairs whose prefix lengths differ by >= 5. Both plants below are pairs
    the old blocking provably missed (old bands floor(24/5)=4 vs
    floor(30/5)=6, and floor(19/5)=3 vs floor(21/5)=4); the complete
    adjacent-band-of-width-d blocking must find them."""
    from my_crawler_spark.operators.dedup import fuzzy_pairs

    t24 = "abcdefghijklmnopqrstuvwx"            # len 24
    t30 = t24 + "123456"                        # len 30, distance 6
    t19 = "zyxwvutsrqponmlkjih"                 # len 19
    t21 = t19 + "00"                            # len 21, distance 2
    docs = spark.createDataFrame(
        [(1, t24), (2, t30), (3, t19), (4, t21)], "doc_id long, text string"
    )
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in fuzzy_pairs(
        docs, prefix_len=40, max_distance=20
    ).collect()}
    assert got[(1, 2)] == 6
    assert got[(3, 4)] == 2


def _naive_pairs(titles: dict[int, str], d: int) -> dict:
    """Blocking-free ground truth via plain-Python Levenshtein."""
    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[len(b)]

    ids = sorted(titles)
    return {
        (x, y): lev(titles[x], titles[y])
        for i, x in enumerate(ids) for y in ids[i + 1:]
        if lev(titles[x], titles[y]) <= d
    }


def test_fuzzy_pairs_complete_vs_naive(spark):
    """Both candidate paths (signature + short-band) together must equal the
    all-pairs ground truth — completeness, not just soundness."""
    from my_crawler_spark.operators.dedup import fuzzy_pairs

    titles = {}
    for i in range(40):
        base = f"document title number {i % 7} about topic {i % 5}"
        if i % 3 == 0:
            base = base[: 20 + i % 15]          # varied lengths
        if i % 4 == 1:
            base = base.replace("t", "7", 1)    # planted typos
        titles[i] = base.lower()[:40]
    titles[90] = "ab"                            # zero/low-gram shorties
    titles[91] = "ac"
    titles[92] = ""
    docs = spark.createDataFrame(
        [(k, v) for k, v in titles.items()], "doc_id long, text string"
    )
    for d in (2, 20):
        got = {(r["id_a"], r["id_b"]): r["dist"] for r in fuzzy_pairs(
            docs, prefix_len=40, max_distance=d
        ).collect()}
        assert got == _naive_pairs(titles, d), f"max_distance={d}"


def test_fuzzy_signature_key_cardinality_scales(spark):
    """Non-skew check: the signature block key is gram CONTENT, so its
    cardinality grows with the corpus instead of saturating at the old
    ~9 length bands."""
    from my_crawler_spark.operators.dedup import _fuzzy_titles, fuzzy_signatures

    def key_count(n: int) -> int:
        docs = spark.createDataFrame(
            [(i, f"page {i * 37 % 911} snippet {i} word{i % 53}") for i in range(n)],
            "doc_id long, text string",
        )
        t = _fuzzy_titles(docs, "doc_id", "text", 40, 2)
        return (
            fuzzy_signatures(t, max_distance=2)
            .select("gram").distinct().count()
        )

    small, large = key_count(50), key_count(200)
    assert small > 9 and large > small


def test_semdedup_hot_list_salting_is_invisible(spark):
    """A planted hot list (every vector crowds into one centroid's list)
    must produce IDENTICAL output whether the self-join is salted or not —
    the salt only changes the join's task layout, never the pair set."""
    import numpy as np

    from my_crawler_spark.operators.dedup import semdedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal(8)
    rows = []
    for i in range(60):
        v = base + 0.01 * rng.standard_normal(8)   # one crowded direction
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def run(**kw):
        return sorted(
            tuple(r) for r in semdedup(
                emb, n_lists=4, threshold=0.9, **kw
            ).collect()
        )

    salted = run(hot_list_bound=10, n_salt=4)
    plain = run(hot_list_bound=10**9)
    assert salted == plain and len(salted) > 0
