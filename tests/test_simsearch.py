"""Similarity search: brute-force exactness, LSH/IVF recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from my_crawler_spark.operators import simsearch as SS

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(DIM).astype(float).tolist()) for i in range(300)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), rows


def test_brute_force_matches_numpy(spark, emb):
    df, rows = emb
    q = rows[0][1]
    got = SS.brute_force_topk(df, [(0, q)], k=5).orderBy("rank").collect()
    mat = np.array([r[1] for r in rows])
    qv = np.array(q)
    cos = (mat @ qv) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    want = np.argsort(-cos)[:5].tolist()
    assert [r.vec_id for r in got] == want
    for r in got:
        assert r.cos == pytest.approx(cos[r.vec_id], rel=1e-6)


def test_lsh_recall(spark, emb):
    df, rows = emb
    queries = [(i, rows[i][1]) for i in range(5)]
    idx = SS.lsh_index(df, dim=DIM, n_bits=4, n_tables=8)
    got = SS.lsh_topk(idx, queries, dim=DIM, k=10, n_bits=4, n_tables=8).collect()
    brute = SS.brute_force_topk(df, queries, k=10).collect()
    by_q_lsh = {}
    for r in got:
        by_q_lsh.setdefault(r.query_id, set()).add(r.vec_id)
    by_q_brute = {}
    for r in brute:
        by_q_brute.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(by_q_lsh.get(q, set()) & by_q_brute[q]) / 10 for q in by_q_brute
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # tunable-recall ANN
    # the query vector itself is always found (hashes into its own bucket)
    for q, _ in queries:
        assert q in by_q_lsh[q]


def test_ivf_recall(spark, emb):
    df, rows = emb
    queries = [(i, rows[i][1]) for i in range(3)]
    assigned, cents = SS.ivf_index(df, n_lists=8)
    got = SS.ivf_topk(assigned, cents, queries, k=10, n_probe=4).collect()
    brute = SS.brute_force_topk(df, queries, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    by_b = {}
    for r in brute:
        by_b.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(by_q.get(q, set()) & by_b[q]) / 10 for q in by_b]
    assert sum(recalls) / len(recalls) >= 0.5


def test_ivf_384d_plan_is_small_and_fast(spark):
    """Regression for the IVF centroid-assignment expression bomb: at 384-d
    x 16 lists the old when/otherwise chain built ~6k Catalyst nodes; the
    pandas_udf argmax keeps the plan O(1) in dim and list count."""
    import time

    rng = np.random.default_rng(13)
    rows = [(i, rng.standard_normal(384).astype(float).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    t0 = time.time()
    assigned, cents = SS.ivf_index(df, n_lists=16)
    queries = [(i, rows[i][1]) for i in range(3)]
    got = SS.ivf_topk(assigned, cents, queries, k=10, n_probe=4).collect()
    assert time.time() - t0 < 30  # expression-tree variant: minutes
    assert len(cents) == 16
    brute = SS.brute_force_topk(df, queries, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    by_b = {}
    for r in brute:
        by_b.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(by_q.get(q, set()) & by_b[q]) / 10 for q in by_b]
    assert sum(recalls) / len(recalls) >= 0.5


def test_lsh_384d_plan_is_small_and_fast(spark):
    """Regression for the SRP bucket expression bomb: at the engine's real
    embedding dimensionality (384, operators/extract.py EMBED_DIM) the
    bucket ids must come from one pandas_udf matmul — plan analysis is O(1)
    in dim, not n_bits*dim literal nodes (which took minutes at 384-d)."""
    import time

    rng = np.random.default_rng(11)
    rows = [(i, rng.standard_normal(384).astype(float).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    t0 = time.time()
    idx = SS.lsh_index(df, dim=384, n_bits=8, n_tables=4)
    assert idx.count() == 60 * 4
    assert time.time() - t0 < 30  # expression-tree variant: minutes
    got = SS.lsh_topk(idx, [(0, rows[0][1])], dim=384, k=5, n_bits=8, n_tables=4).collect()
    assert any(r.vec_id == 0 and r.rank == 1 for r in got)


def test_centroid_sample_plan_is_distributed_topk(spark, emb):
    """VERDICT r3 #1: the IVF centroid pick must be a TakeOrderedAndProject
    (per-partition local top-k, driver merge) — no unpartitioned Window
    funneling the whole embeddings table through one task, and no extra
    count() action."""
    df, _ = emb
    plan = SS.centroid_sample(df, 8)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_batch_100_queries_plan_builds_fast(spark):
    """VERDICT r3 #2: rescoring is one broadcast-join plan whatever the
    query count — 100 queries must analyze in seconds (the old per-query
    filter+union loop grew the plan linearly and became a planner bomb)."""
    import time

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(DIM).astype(float).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = [(i, rows[i][1]) for i in range(100)]

    t0 = time.time()
    brute = SS.brute_force_topk(df, queries, k=5)
    brute.schema  # forces analysis
    idx = SS.lsh_index(df, dim=DIM, n_bits=4, n_tables=4)
    lsh = SS.lsh_topk(idx, queries, dim=DIM, k=5, n_bits=4, n_tables=4)
    lsh.schema
    assigned, cents = SS.ivf_index(df, n_lists=8)
    ivf = SS.ivf_topk(assigned, cents, queries, k=5, n_probe=4)
    ivf.schema
    assert time.time() - t0 < 5.0

    # and the batched plans still answer correctly: every query's own
    # vector ranks first in the exact scorer and appears in the LSH probe
    got = {(r.query_id, r.rank): r.vec_id for r in brute.collect()}
    for q, _ in queries[:10]:
        assert got[(q, 1)] == q
    lsh_top = {}
    for r in lsh.collect():
        lsh_top.setdefault(r.query_id, set()).add(r.vec_id)
    for q, _ in queries[:10]:
        assert q in lsh_top[q]


def test_sq8_codes_match_python_and_recall_vs_exact(spark):
    import math

    from my_crawler_spark.operators.simsearch import (
        brute_force_topk,
        sq8_index,
        sq8_scales,
        sq8_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.5]),
        (1, [0.9, 0.1, 0.4]),
        (2, [-1.0, 2.0, 0.0]),
        (3, [0.0, 0.0, 0.0]),
        (4, [0.5, -2.0, 0.25]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    scales = sq8_scales(emb)
    s = scales.collect()[0]["scales"]
    assert s == [1.0, 2.0, 0.5]
    idx = {r["vec_id"]: r["codes"] for r in sq8_index(emb, scales).collect()}

    def code(v, sc):
        return 0 if sc == 0 else max(-127, min(127, math.floor(v / sc * 127 + 0.5)))

    for vid, vec in rows:
        assert idx[vid] == [code(v, sc) for v, sc in zip(vec, s)], vid
    # zero vector -> all-zero codes, never NaN
    assert idx[3] == [0, 0, 0]

    qs = [(0, [1.0, 0.0, 0.5]), (2, [-1.0, 2.0, 0.0])]
    # sq8_topk tolerates the all-zero vector (scores 0.0); the exact
    # baseline's plain cosine does not, so compare on the nonzero slice
    nz = emb.filter("vec_id != 3")
    approx = sq8_topk(sq8_index(nz, scales), scales, qs, k=3)
    exact = brute_force_topk(nz, qs, k=3)
    # and the zero vector itself ranks with cos 0.0, no error
    z = sq8_topk(sq8_index(emb, scales), scales, qs, k=5)
    zrows = [r for r in z.collect() if r["vec_id"] == 3]
    assert zrows and all(r["cos"] == 0.0 for r in zrows)
    a = {(r["query_id"], r["rank"]): r["vec_id"] for r in approx.collect()}
    e = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    # 3-dim toy at int8 resolution: quantized ranking == exact ranking
    assert a == e


def test_pq_codes_match_python_twin_and_adc_ranking(spark):
    import hashlib

    from my_crawler_spark.operators.simsearch import pq_codebook, pq_index, pq_topk

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0, 0.0, 0.9, 0.1, 0.0]),
        (3, [0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    cb = pq_codebook(emb, dim=8, m=2, n_centroids=2)
    sha = lambda i: hashlib.sha256(str(i).encode()).hexdigest()[:12]
    picked = sorted(range(4), key=lambda i: (sha(i), i))[:2]
    got_cb = {(r["sub"], r["cid"]): r["cvec"] for r in cb.collect()}
    for j in (0, 1):
        for cid in picked:
            assert got_cb[(j, cid)] == rows[cid][1][j * 4 : (j + 1) * 4]

    codes = {(r["vec_id"], r["sub"]): r["cid"] for r in pq_index(emb, cb, dim=8, m=2).collect()}

    def argmin(vid, j):
        sv = rows[vid][1][j * 4 : (j + 1) * 4]
        return min(
            picked,
            key=lambda cid: (
                round(sum((a - b) ** 2 for a, b in zip(sv, rows[cid][1][j * 4 : (j + 1) * 4])), 9),
                cid,
            ),
        )

    for vid in range(4):
        for j in (0, 1):
            assert codes[(vid, j)] == argmin(vid, j), (vid, j)

    # ADC: querying with row 0's exact vector ranks a row coded like row 0 first
    top = pq_topk(pq_index(emb, cb, dim=8, m=2), cb, [(0, rows[0][1])], dim=8, m=2, k=4)
    got = [(r["vec_id"], r["dist"]) for r in top.orderBy("rank").collect()]
    assert len(got) == 4
    dists = [d for _, d in got]
    assert dists == sorted(dists)
    # the doc sharing row 0's codes has ADC distance 0 at the top
    assert got[0][1] == 0.0


def test_pq_refine_improves_recall_and_matches_mean_twin(spark):
    import numpy as np

    from my_crawler_spark.operators.simsearch import (
        brute_force_topk,
        pq_codebook,
        pq_index,
        pq_refine,
        pq_topk,
    )

    rng = np.random.default_rng(5)
    # 3 planted gaussian clusters in 8-d so refinement has structure to find
    centers = rng.standard_normal((3, 8)) * 3
    rows = [
        (i, (centers[i % 3] + rng.standard_normal(8) * 0.3).tolist())
        for i in range(120)
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    cb0 = pq_codebook(emb, dim=8, m=2, n_centroids=8)
    cb1 = pq_refine(emb, cb0, dim=8, m=2)

    # refined centroid == rounded mean of its assigned subvectors (twin)
    codes0 = {(r["vec_id"], r["sub"]): r["cid"] for r in pq_index(emb, cb0, dim=8, m=2).collect()}
    got1 = {(r["sub"], r["cid"]): r["cvec"] for r in cb1.collect()}
    by_centroid = {}
    for (vid, sub), cid in codes0.items():
        sv = rows[vid][1][sub * 4 : (sub + 1) * 4]
        by_centroid.setdefault((sub, cid), []).append(sv)
    for key, svs in by_centroid.items():
        want = [round(float(np.mean([s[i] for s in svs])), 6) for i in range(4)]
        assert got1[key] == pytest.approx(want, abs=2e-6), key

    # exact top-k within a tight planted cluster is unresolvable at PQ cell
    # granularity (ADC ties), so the guarantee to test is CLUSTER purity:
    # after one Lloyd step every retrieved neighbor comes from the query's
    # planted cluster
    qs = [(i, rows[i][1]) for i in range(5)]
    top = pq_topk(pq_index(emb, cb1, dim=8, m=2), cb1, qs, dim=8, m=2, k=10)
    for r in top.collect():
        assert r["vec_id"] % 3 == r["query_id"] % 3, (r["query_id"], r["vec_id"])


def test_ivfpq_topk_prunes_matches_twin_and_recalls(spark):
    """IVF x PQ composition (simsearch.py::ivfpq_topk): candidates must come
    only from the query's probed lists, reported ADC distances must match a
    plain-Python twin recomputed from the sha-sampled codebook, ranks must
    ascend by (dist, id), and top-10 overlap vs brute force must clear the
    same recall floor as the IVF-alone path."""
    import hashlib

    from my_crawler_spark.operators.simsearch import (
        ivfpq_topk,
        pq_codebook,
        pq_index,
    )

    rng = np.random.default_rng(11)
    # planted gaussian clusters so pruning + quantization have structure
    centers = rng.standard_normal((4, 16)) * 3
    rows = [
        (i, (centers[i % 4] + rng.standard_normal(16) * 0.3).tolist())
        for i in range(200)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    assigned, cents = SS.ivf_index(df, n_lists=8)
    cb = pq_codebook(df, dim=16, m=4, n_centroids=64)
    codes = pq_index(df, cb, dim=16, m=4)
    qs = [(i, rows[i][1]) for i in range(3)]
    got = ivfpq_topk(
        assigned, cents, codes, cb, qs, dim=16, m=4, k=10, n_probe=4
    ).collect()

    # --- pruning: every reported vec belongs to one of its query's probed lists
    list_of = {r["vec_id"]: r["list_id"] for r in assigned.collect()}
    cn = np.asarray(cents, dtype=np.float64)
    cn = cn / np.maximum(np.linalg.norm(cn, axis=1, keepdims=True), 1e-12)
    probed = {}
    for qid, vec in qs:
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        probed[qid] = set(np.argsort(-(cn @ v))[:4].tolist())
    for r in got:
        assert list_of[r["vec_id"]] in probed[r["query_id"]], r

    # --- ADC twin: plain-Python replay of codebook pick, code argmin, lookup
    sha = lambda i: hashlib.sha256(str(i).encode()).hexdigest()[:12]
    picked = sorted(range(200), key=lambda i: (sha(i), i))[:64]

    def l2sq(a, b):
        return round(sum((x - y) ** 2 for x, y in zip(a, b)), 9)

    def sub(v, j):
        return v[j * 4 : (j + 1) * 4]

    def code(vid, j):
        sv = sub(rows[vid][1], j)
        return min(picked, key=lambda cid: (l2sq(sv, sub(rows[cid][1], j)), cid))

    for r in got:
        want = round(
            sum(
                l2sq(sub(rows[r["query_id"]][1], j), sub(rows[code(r["vec_id"], j)][1], j))
                for j in range(4)
            ),
            6,
        )
        assert r["dist"] == pytest.approx(want, abs=2e-6), r

    # --- ranks ascend by (dist, vec_id) within each query
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(r["dist"], r["vec_id"]) for r in rs]
        assert keys == sorted(keys), qid

    # --- recall@10 vs the EXACT squared-L2 top-10 (ADC approximates L2, so
    # L2 — not cosine — is the honest brute-force baseline) clears the same
    # 0.5 floor as the IVF-alone path
    M = np.array([v for _, v in rows])
    by_g = {}
    for r in got:
        by_g.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = []
    for qid, vec in qs:
        l2 = ((M - np.asarray(vec)) ** 2).sum(axis=1)
        exact = set(np.argsort(l2)[:10].tolist())
        recalls.append(len(by_g.get(qid, set()) & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.5
