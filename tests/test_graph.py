"""PageRank over the link graph — verified against an independent numpy
power iteration with identical semantics (uniform dangling redistribution)."""

from __future__ import annotations

import numpy as np
import pytest

from my_crawler_spark.operators.graph import pagerank


def _numpy_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dangling = r[out == 0].sum()
        nxt += d * dangling / n
        for u, v in edges:
            nxt[idx[v]] += d * r[idx[u]] / out[idx[u]]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        # simple cycle + chain + dangling sink ("d" has no out-edges)
        [("a", "b"), ("b", "a"), ("c", "a"), ("a", "d")],
        # star: hub pointed at by everyone, hub dangling
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub")],
    ],
)
def test_pagerank_matches_numpy(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_sink_gains_rank(spark):
    # everyone links to 'hub'; hub must outrank the spokes
    edges = [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=15).collect()}
    assert got["hub"] > max(got["s1"], got["s2"], got["s3"])


def test_pagerank_duplicate_edges_collapse(spark):
    # edge list is DISTINCTed: duplicates must not double-weight a link
    once = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")]
    twice = once + [("a", "b")]
    d1 = spark.createDataFrame(once, "src string, dst string")
    d2 = spark.createDataFrame(twice, "src string, dst string")
    g1 = {r["node"]: r["rank"] for r in pagerank(d1).collect()}
    g2 = {r["node"]: r["rank"] for r in pagerank(d2).collect()}
    for k in g1:
        assert g1[k] == pytest.approx(g2[k], abs=1e-12)


def test_hits_matches_python_power_iteration(spark):
    from my_crawler_spark.operators.graph import hits

    edges = [("a", "b"), ("a", "c"), ("d", "b"), ("d", "c"), ("b", "c"), ("c", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(df, iters=8).collect()}

    nodes = sorted({x for e in edges for x in e})
    h = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(8):
        a = {v: sum(h[u] for u, w in edges if w == v) for v in nodes}
        s = sum(a.values())
        a = {v: x / s for v, x in a.items()}
        h = {v: sum(a[w] for u, w in edges if u == v) for v in nodes}
        s = sum(h.values())
        h = {v: x / s for v, x in h.items()}

    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v][0] == pytest.approx(h[v], abs=1e-9), ("hub", v)
        assert got[v][1] == pytest.approx(a[v], abs=1e-9), ("auth", v)
    # structure: c is the strongest authority (3 in-links incl. hub b);
    # a and d are the strongest hubs (they point at both b and c)
    assert max(got, key=lambda v: got[v][1]) == "c"
    assert {max(got, key=lambda v: got[v][0])} <= {"a", "d"}


def test_triangle_counts_small_graph(spark):
    from my_crawler_spark.operators.graph import triangle_counts

    # K4 on a,b,c,d (4 triangles, each node in 3) + pendant e + self loop
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "e"), ("c", "a"),  # reverse dup + self loop
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}


def test_deterministic_walks_follow_hash_rule(spark):
    import hashlib

    from my_crawler_spark.operators.graph import deterministic_walks

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["start"]: (r["c1"], r["c2"], r["c3"]) for r in deterministic_walks(df, steps=3).collect()}

    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)

    def step(u, k):
        if u is None or u not in out:
            return None
        return min(out[u], key=lambda v: (hashlib.sha256(f"{u}|{k}|{v}".encode()).hexdigest(), v))

    for start in ("a", "b", "c", "d"):
        c1 = step(start, 1)
        c2 = step(c1, 2)
        c3 = step(c2, 3)
        assert got[start] == (c1, c2, c3), start
    # d is a dead end: whole walk NULL
    assert got["d"] == (None, None, None)


def test_triangle_orientation_bounds_hub_wedges(spark):
    """Planted star hub: a degree-200 hub plus a small clique. Under the
    (deg, id) orientation all star edges point INTO the hub, so the hub
    contributes zero wedges — the wedge stage must stay far below the
    deg^2 blow-up of the unoriented join — while triangle counts still
    match: the spokes form no triangles, the clique's are all found."""
    from my_crawler_spark.operators.graph import (
        _canonical_edges,
        _oriented_wedges,
        triangle_counts,
    )

    hub = [("hub", f"s{i}") for i in range(200)]
    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    df = spark.createDataFrame(hub + clique + [("hub", "c0")],
                               "src string, dst string")
    canon = _canonical_edges(df, "src", "dst")
    _, wedges = _oriented_wedges(canon)
    n_wedges = wedges.count()
    # unoriented wedge count at the hub alone would be C(201,2) = 20100
    assert n_wedges < 100, n_wedges
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got["hub"] == 0 and got["s0"] == 0
    assert all(got[f"c{i}"] == 6 for i in range(5))  # each K5 node: C(4,2)


def test_label_propagation_two_cliques_and_python_twin(spark):
    from my_crawler_spark.operators.graph import label_propagation

    # two 5-cliques bridged by a single edge; labels must converge to one
    # label per clique (the min node id of each), bridge notwithstanding
    def clique(prefix, n):
        ids = [f"{prefix}{i}" for i in range(n)]
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique("a", 5) + clique("b", 5) + [("a0", "b0")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["label"] for r in label_propagation(df, iters=8).collect()}

    # python twin: same synchronous rounds, same tie rule
    und = {}
    for s, d in edges:
        if s != d:
            und.setdefault(s, set()).add(d)
            und.setdefault(d, set()).add(s)
    labels = {n: n for n in und}
    for _ in range(8):
        new = {}
        for n, nbrs in und.items():
            cnt = {}
            for b in nbrs:
                cnt[labels[b]] = cnt.get(labels[b], 0) + 1
            new[n] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = new
    assert got == labels
    # communities: every a* node shares one label, every b* another
    a_labels = {got[f"a{i}"] for i in range(5)}
    b_labels = {got[f"b{i}"] for i in range(5)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels
