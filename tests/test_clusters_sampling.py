"""Duplicate-cluster canonicalization + deterministic sampling.

duplicate_clusters: connected components over near-dup pairs (min-label
propagation + pointer doubling, parquet-checkpointed iterations).
sampling: sha256-keyed reproducible sampling (hash_sample / split_assign /
stratified_sample) — cross-checked against hashlib ground truth.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from my_crawler_spark.operators.dedup import duplicate_clusters
from my_crawler_spark.operators.sampling import (
    _hex_threshold,
    hash_sample,
    split_assign,
    stratified_sample,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _clusters(df):
    rows = df.collect()
    return {r["id"]: (r["cluster_id"], r["cluster_size"]) for r in rows}


def test_clusters_chain_clique_and_pair(spark):
    # chain 1-2-3, clique {10,11,12}, pair {20,21}
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (10, 11), (10, 12), (11, 12), (20, 21)],
    )
    got = _clusters(duplicate_clusters(pairs))
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 3), 11: (10, 3), 12: (10, 3),
        20: (20, 2), 21: (20, 2),
    }


def test_clusters_long_chain_converges(spark):
    # 40-node path: diameter 39, pointer doubling must converge well inside
    # max_iters=25 (log2(40) ~ 5.3 pointer-hop rounds)
    n = 40
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    got = _clusters(duplicate_clusters(pairs))
    assert set(got) == set(range(n))
    assert all(v == (0, n) for v in got.values())


def test_clusters_reverse_labeled_chain(spark):
    # min id at the FAR end of the chain (worst case for propagation)
    pairs = _pairs(spark, [(i, i + 1) for i in range(10, 20)]).union(
        _pairs(spark, [(20, 1)])
    )
    got = _clusters(duplicate_clusters(pairs))
    assert all(cid == 1 for cid, _ in got.values())
    assert all(sz == 12 for _, sz in got.values())


def test_clusters_empty_pairs(spark):
    out = duplicate_clusters(_pairs(spark, []))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "cluster_id", "cluster_size"]


def _truth_frac(key) -> str:
    return hashlib.sha256(str(key).encode()).hexdigest()[:12]


def test_hash_sample_matches_hashlib_truth(spark):
    ids = list(range(500))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.2).collect()}
    want = {i for i in ids if _truth_frac(i) < _hex_threshold(0.2)}
    assert got == want
    assert 0.1 < len(got) / len(ids) < 0.3  # ~uniform


def test_hash_sample_nested_rates(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    small = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.05).collect()}
    big = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.25).collect()}
    assert small <= big  # prefix stability: lower rate is a subset


def test_hash_sample_rate_one_keeps_all(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    assert hash_sample(df, "doc_id", 1.0).count() == 100


def test_split_assign_rates_summing_to_one_cover_everyone(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = split_assign(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.where("split IS NULL").count() == 0


def test_split_assign_disjoint_and_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = split_assign(df, "doc_id", {"train": 0.8, "val": 0.1})
    b = split_assign(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.05})
    ga = {r["doc_id"]: r["split"] for r in a.collect()}
    gb = {r["doc_id"]: r["split"] for r in b.collect()}
    # adding a later split never moves earlier assignments
    for k, v in ga.items():
        if v is not None:
            assert gb[k] == v
    assert {v for v in gb.values()} == {"train", "val", "test", None}


def test_stratified_sample_quota_and_determinism(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)] + [
        (1000 + i, "tiny") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "doc_id", "lang", 10)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 10, "de": 10, "fr": 10, "tiny": 4}
    # deterministic: the quota-smallest hashlib keys per stratum
    en_want = sorted(
        (i for i, l in rows if l == "en"), key=lambda i: (_truth_frac(i), i)
    )[:10]
    en_got = sorted(r["doc_id"] for r in out.where("lang = 'en'").collect())
    assert en_got == sorted(en_want)


def test_mixture_rebalance(spark):
    """Plan math: T binds on the scarcest-relative source; the over-weighted
    scarce source keeps everything; kept rows are exactly the hashlib truth
    under each source's rate (downsampling only, deterministic)."""
    from my_crawler_spark.operators.sampling import apply_mixture, mixture_plan

    rows = [(i, "A") for i in range(8)]
    rows += [(100 + i, "B") for i in range(4)]
    rows += [(200 + i, "C") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"A": 0.5, "B": 0.25, "C": 0.25}
    # T = min(8/.5, 4/.25, 2/.25) = 8 -> rates A .5, B .5, C 1.0
    plan = {r.source: r for r in mixture_plan(df, weights).collect()}
    assert plan["A"].keep_rate == 0.5 and plan["B"].keep_rate == 0.5
    assert plan["C"].keep_rate == 1.0 and plan["C"].available == 2
    kept = {r.doc_id for r in apply_mixture(df, weights).collect()}
    want = set()
    for i, src in rows:
        rate = plan[src].keep_rate
        if _truth_frac(i) < _hex_threshold(rate):
            want.add(i)
    assert kept == want
    assert {200, 201} <= kept  # rate-1.0 source fully kept (sentinel path)


def test_pack_sequences(spark):
    """Hand-checked packing: docs of 5/10/4 tokens into 8-token sequences —
    the 10-token doc spans the seq0/seq1 boundary, offsets tile exactly."""
    from my_crawler_spark.operators.sampling import pack_sequences

    rows = [
        (1, "A", "a b c d e"),
        (2, "A", "f g h i j k l m n o"),
        (3, "A", "p q r s"),
        (4, "B", ""),  # empty doc packs to nothing
    ]
    got = sorted(
        (r.doc_id, r.seq_id, r.tok_start, r.tok_end)
        for r in pack_sequences(
            spark.createDataFrame(rows, "doc_id long, source string, text string"),
            seq_len=8,
        ).collect()
    )
    # stream: d1 [0,5) d2 [5,15) d3 [15,19); seqs of 8 tokens
    assert got == [
        (1, 0, 0, 5),
        (2, 0, 5, 8),
        (2, 1, 0, 7),
        (3, 1, 7, 8),
        (3, 2, 0, 3),
    ]


def test_weighted_sample_matches_python_twin_and_is_weight_monotone(spark):
    import hashlib
    import math

    from my_crawler_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(200)] + [(900, 0.0)]
    df = spark.createDataFrame(rows, "id long, w double")

    def es_key(i, w):
        u = (int(hashlib.sha256(str(i).encode()).hexdigest()[:12], 16) + 0.5) / 2**48
        return round(round(-math.log(u), 9) / w, 9)

    want = sorted(((es_key(i, w), i) for i, w in rows if w > 0))[:20]
    got = weighted_sample(df, "id", "w", 20).collect()
    assert [(r["es_key"], r["id"]) for r in got] == want
    # zero-weight row can never be sampled even with k == n
    all_ids = {r["id"] for r in weighted_sample(df, "id", "w", 1000).collect()}
    assert 900 not in all_ids and len(all_ids) == 200
    # monotonicity in expectation: with weights 1 vs 100 on a big
    # population, the heavy half dominates the sample
    big = spark.createDataFrame(
        [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(2000)], "id long, w double"
    )
    heavy = sum(1 for r in weighted_sample(big, "id", "w", 200).collect() if r["id"] % 2 == 0)
    assert heavy > 170


def test_pack_best_fit_matches_python_twin_and_invariants(spark):
    from my_crawler_spark.operators.sampling import pack_best_fit

    rows = [(i, i % 3, [120, 200, 90, 60, 256, 300, 30, 10][i % 8]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, shard long, tokens long")
    got = pack_best_fit(df, max_tokens=256).collect()

    # python twin per shard: BFD with fullest-fits-first, ties lowest bin
    def twin(items):
        items = sorted(items, key=lambda r: (-r[1], r[0]))
        fills, assign = [], {}
        for did, t in items:
            best = -1
            for i, f in enumerate(fills):
                if f + t <= 256 and (best < 0 or f > fills[best]):
                    best = i
            if best < 0:
                best = len(fills)
                fills.append(0)
            fills[best] += t
            assign[did] = best
        return assign, fills

    by_shard = {}
    for did, sh, t in rows:
        by_shard.setdefault(sh, []).append((did, t))
    for sh, items in by_shard.items():
        want, fills = twin(items)
        got_sh = {r["doc_id"]: r["bin_id"] for r in got if r["shard"] == sh}
        assert got_sh == want, sh
        # invariants: every doc once; bins valid; <=1 half-empty bin
        assert len(got_sh) == len(items)
        by_bin = {}
        for did, b in got_sh.items():
            by_bin.setdefault(b, []).append(dict(items)[did])
        for b, ts in by_bin.items():
            assert sum(ts) <= 256 or len(ts) == 1, (sh, b)
        assert sum(1 for ts in by_bin.values() if sum(ts) <= 128) <= 1, sh
    # the oversize doc (300 tokens) sits alone in its bin
    for r in got:
        if r["tokens"] == 300:
            mates = [x for x in got if x["shard"] == r["shard"] and x["bin_id"] == r["bin_id"]]
            assert len(mates) == 1
