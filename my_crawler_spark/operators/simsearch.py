"""Similarity search over embedding columns (array<float>).

- brute_force_topk : exact cosine top-k per query — the correctness
  baseline; one scan + window top-k, JVM-side arithmetic
  (zip_with/aggregate), no Python.
- lsh_topk         : random-hyperplane (SRP) LSH-bucketed ANN — the scale
  path. Vectors hash to `n_tables` bucket keys; a query probes its buckets
  only, cutting the scanned fraction to ~n_tables/2^n_bits. Recall is
  tunable (tests assert recall@10 >= 0.6 vs brute force on the fixture).
- ivf_topk         : IVF-style coarse quantization: k centroids picked as
  deterministic data samples, vectors assigned to nearest centroid
  (one broadcast join), queries probe `n_probe` nearest lists.

At 100 TB the bucketed variants turn an all-pairs scan into a partition-
pruned read: bucket id is the partition key of the embeddings table.

Batch-query shape: every rescorer takes its query set as ONE broadcast
(query_id, qv) DataFrame joined against the candidate set, with cosine
computed once as a single column — plan size is O(1) in query count. (The
previous per-query `filter(query_id == qid)` union loop embedded a
dim-literal array per query and grew the plan linearly — a planner bomb at
batch sizes; see tests/test_simsearch.py::test_batch_query_plan_is_flat.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

from .search import cosine


def _queries_df(spark, queries: list[tuple[int, list[float]]]) -> DataFrame:
    """Tiny (query_id, qv) dim — always broadcast into the rescoring join."""
    return spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in queries],
        "query_id long, qv array<double>",
    )


def _rank_topk(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (query_id, vec_id, cos, rank) for each query vector.

    One broadcast-nested-loop join of the scan against the (query_id, qv)
    dim + one cosine column: each embeddings row is scored against every
    query in a single pass, whatever the batch size.
    """
    qdf = _queries_df(embeddings.sparkSession, queries)
    scored = embeddings.crossJoin(F.broadcast(qdf)).select(
        "query_id",
        F.col(id_col),
        cosine(F.col(vec_col), F.col("qv")).alias("cos"),
    )
    return _rank_topk(scored, k, id_col)


def _srp_planes(dim: int, n_bits: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).astype(np.float64)


def lsh_index(
    embeddings: DataFrame,
    dim: int,
    n_bits: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(table, bucket, id, vec) — at scale, write partitioned by (table,
    bucket) so probes become partition-pruned scans.

    Bucket ids come from ONE scalar pandas_udf: a single numpy tensordot of
    the Arrow batch against the broadcast (n_tables, n_bits, dim) plane
    tensor, then posexplode — O(1) plan size at any dimensionality and one
    scan for all tables. (A pure-column-expression variant builds
    n_tables*n_bits*dim literal multiply nodes — a Catalyst analysis bomb at
    384-d — and was replaced by this.)
    """
    planes = _srp_planes(dim, n_bits, n_tables, seed)
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(planes)
    weights = 1 << np.arange(n_bits, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        P = bc.value  # (T, n_bits, D)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])  # (n, D)
        bits = np.tensordot(V, P, axes=([1], [2])) > 0  # (n, T, n_bits)
        ids = bits.astype(np.int64) @ weights  # (n, T)
        return pd.Series([row.tolist() for row in ids])

    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(bucket_ids(F.col(vec_col))).alias("table", "bucket"),
    ).select("table", "bucket", id_col, vec_col)


def lsh_topk(
    index: DataFrame,
    queries: list[tuple[int, list[float]]],
    dim: int,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Probe each query's buckets across tables, exact-rescore the union.

    Two broadcast joins, both O(1) in plan size: (query_id, table, bucket)
    probes prune the index scan, then the (query_id, qv) dim supplies each
    candidate's query vector for a single cosine column.
    """
    planes = _srp_planes(dim, n_bits, n_tables, seed)
    weights = 1 << np.arange(n_bits, dtype=np.int64)
    probes = []
    for qid, vec in queries:
        # same tensordot shape as lsh_index's UDF so a vector that is both
        # indexed and queried lands in identical buckets
        v = np.asarray(vec, dtype=np.float64)[None, :]
        bits = np.tensordot(v, planes, axes=([1], [2]))[0] > 0  # (T, n_bits)
        for t, row in enumerate(bits.astype(np.int64) @ weights):
            probes.append((qid, t, int(row)))
    spark = index.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, table int, bucket long")
    cands = (
        index.join(F.broadcast(probe_df), ["table", "bucket"])
        .select("query_id", id_col, vec_col)
        .distinct()
    )
    qdf = _queries_df(spark, queries)
    scored = cands.join(F.broadcast(qdf), "query_id").select(
        "query_id",
        F.col(id_col),
        cosine(F.col(vec_col), F.col("qv")).alias("cos"),
    )
    return _rank_topk(scored, k, id_col)


def centroid_sample(
    embeddings: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The n_lists rows with the smallest sampling.hash_fraction(id) (the
    engine-wide sha256 sampling key — see its cross-engine policy): a
    deterministic pseudo-random sample whose plan is a distributed top-k
    (TakeOrderedAndProject — per-partition local top-k, driver merge), with
    no unpartitioned Window, no count() action, and no single-task stage.
    Exposed separately so tests can assert the plan shape."""
    from .sampling import hash_fraction

    return (
        embeddings.select(id_col, vec_col)
        .orderBy(hash_fraction(F.col(id_col)), F.col(id_col))
        .limit(n_lists)
    )


def ivf_index(
    embeddings: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: centroids = the n_lists rows with the smallest
    sampling.hash_fraction(id) (sha256 — the engine-wide cross-engine
    sampling key) — a deterministic pseudo-random sample — assignment by
    max cosine (one pass).

    Centroid selection is a distributed top-k (orderBy + limit compiles to
    TakeOrderedAndProject: each partition keeps its local n_lists smallest
    hashes, the driver merges) — no global window, no count() action, no
    single-task stage, so selection cost is O(n/partitions) per task at any
    table size. (The previous row_number() over an unpartitioned
    Window.orderBy(id) funneled the WHOLE table through one task.)

    Assignment is ONE scalar pandas_udf: an argmax matmul of each Arrow
    batch against the broadcast (n_lists, dim) centroid matrix — O(1) plan
    size at any dim/list count, mirroring lsh_index's bucket_ids. (The old
    column-expression variant chained n_lists when/otherwise nodes, each
    embedding a dim-literal array — ~6k Catalyst nodes at 384-d x 16 lists,
    the same analysis bomb the SRP path had.)
    """
    cents = centroid_sample(embeddings, n_lists, id_col, vec_col).collect()
    centroids = [list(map(float, r[vec_col])) for r in cents]  # bounded: n_lists rows
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    bc = embeddings.sparkSession.sparkContext.broadcast(Cn)

    @F.pandas_udf(IntegerType())
    def nearest_list(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        Cb = bc.value  # (n_lists, D), unit rows
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        # ties keep the lowest list id (np.argmax = first max), matching the
        # probe side's argsort order in ivf_topk
        return pd.Series(np.argmax(V @ Cb.T, axis=1).astype(np.int32))

    assigned = embeddings.withColumn("list_id", nearest_list(F.col(vec_col)))
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe each query's n_probe nearest lists, exact-rescore the union.

    List selection is a driver-side numpy matmul against the (tiny)
    centroid matrix; the cluster work is one broadcast (query_id, list_id)
    probe join pruning the assigned table + one broadcast (query_id, qv)
    join feeding a single cosine column — O(1) plan size in query count.
    """
    cents = np.asarray(centroids, dtype=np.float64)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    probes = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        for lid in np.argsort(-(cn @ v))[:n_probe].tolist():
            probes.append((int(qid), int(lid)))
    spark = assigned.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, list_id int")
    qdf = _queries_df(spark, queries)
    scored = (
        assigned.join(F.broadcast(probe_df), "list_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            cosine(F.col(vec_col), F.col("qv")).alias("cos"),
        )
    )
    return _rank_topk(scored, k, id_col)


def sq8_scales(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension absmax scales for int8 scalar quantization, as ONE row
    holding an array<double> — fully declarative (posexplode -> per-dim max
    -> collect back into position order), no driver collect, so the scales
    relation crossJoins/broadcasts like any other 1-row stats dim."""
    ex = embeddings.select(F.posexplode(F.col(vec_col)).alias("pos", "val"))
    per = ex.groupBy("pos").agg(
        F.max(F.abs(F.col("val").cast("double"))).alias("m")
    )
    return per.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("scales")
    )


def sq8_index(
    embeddings: DataFrame,
    scales: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """int8 scalar-quantized vector index: code_j = clamp(floor(v_j / s_j *
    127 + 0.5), -127, 127) (round-half-up — floor(x+0.5) truncates the same
    way in Spark and DuckDB, sidestepping their CAST rounding mismatch);
    zero-scale dims code to 0. 4 bytes/dim -> 1 byte/dim: at a 10^10-vector
    corpus this is the difference between the index fitting executor memory
    or not, which is why every production ANN stack ships SQ8. All
    arithmetic is exact (int codes, double scales), so the DuckDB oracle
    reproduces codes bit-for-bit."""
    return embeddings.crossJoin(F.broadcast(scales)).select(
        F.col(id_col),
        F.zip_with(
            F.col(vec_col),
            F.col("scales"),
            lambda v, s: F.when(s == 0.0, F.lit(0))
            .otherwise(
                F.greatest(
                    F.lit(-127),
                    F.least(
                        F.lit(127),
                        F.floor(v.cast("double") / s * F.lit(127.0) + F.lit(0.5)).cast(
                            "int"
                        ),
                    ),
                )
            ),
        ).alias("codes"),
    )


def sq8_topk(
    index: DataFrame,
    scales: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric SQ8 search: float queries against dequantized int8 codes
    (v'_j = c_j * s_j / 127), cosine rounded 6dp BEFORE ranking so the
    cross-engine rank tie-break (cos DESC, id) sees identical keys. Same
    broadcast-queries single-pass shape as brute_force_topk. A vector that
    quantizes to all zeros has no direction — it scores 0.0 (try_divide)
    instead of raising under ANSI mode."""
    deq = index.crossJoin(F.broadcast(scales)).select(
        F.col(id_col),
        F.zip_with(
            F.col("codes"), F.col("scales"), lambda c, s: c * s / F.lit(127.0)
        ).alias("deq"),
    )
    qdf = _queries_df(index.sparkSession, queries)
    a, b = F.col("deq"), F.col("qv")
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    scored = deq.crossJoin(F.broadcast(qdf)).select(
        "query_id",
        F.col(id_col),
        F.round(F.coalesce(F.try_divide(dot, na * nb), F.lit(0.0)), 6).alias("cos"),
    )
    return _rank_topk(scored, k, id_col)


def pq_codebook(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace PQ codebook (Jegou et al. 2011): split dim into m
    subspaces and take as centroids the subvectors of the n_centroids rows
    with the smallest sha256(id) — deterministic hash sampling via the
    engine-wide sampling.hash_fraction key, the same no-global-window
    selection rationale as ivf_index (k-means would drift cross-engine;
    sha-sampled codebooks are reproducible bit-for-bit and the standard
    bootstrap before a refinement pass). cid = the sampled row's id (no
    window needed). -> (sub, cid, cvec)."""
    from .sampling import hash_fraction

    if dim % m != 0:
        raise ValueError("dim must divide into m subspaces")
    d_sub = dim // m
    picked = embeddings.orderBy(
        hash_fraction(F.col(id_col)), F.col(id_col)
    ).limit(n_centroids)
    subs = F.array(*[F.lit(j) for j in range(m)])
    return picked.select(
        F.explode(subs).alias("sub"),
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("__v"),
    ).select(
        "sub",
        "cid",
        F.slice(F.col("__v"), F.col("sub") * d_sub + 1, d_sub).alias("cvec"),
    )


def _l2sq(a, b) -> F.Column:
    """Squared L2 between two array columns, rounded 9dp (cross-engine libm
    discipline — the 48-term in-order fold's shuffle-free, but the oracle's
    list_sum may associate differently; 9dp swallows the 1e-13 noise)."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )


def pq_index(
    embeddings: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes: per (row, subspace), the codebook entry minimizing squared
    L2 (ties by cid). argmin is min(struct(l2, cid)) — a partial-aggregable
    groupBy, NOT a window, so map-side combine eats the n_centroids fan-out
    before the exchange. At 384-d/m=8/16 centroids this stores 8 small ints
    per vector: 48x smaller than float32. -> (id, sub, cid)."""
    d_sub = dim // m
    subs = F.array(*[F.lit(j) for j in range(m)])
    sv = embeddings.select(
        F.col(id_col), F.explode(subs).alias("sub"), F.col(vec_col).alias("__v")
    ).select(
        id_col,
        "sub",
        F.slice(F.col("__v"), F.col("sub") * d_sub + 1, d_sub).alias("svec"),
    )
    scored = sv.join(F.broadcast(codebook), "sub").select(
        id_col,
        "sub",
        F.struct(
            _l2sq(F.col("svec").cast("array<double>"), F.col("cvec").cast("array<double>")).alias("d"),
            F.col("cid").alias("cid"),
        ).alias("dc"),
    )
    return (
        scored.groupBy(id_col, "sub")
        .agg(F.min("dc").alias("best"))
        .select(id_col, "sub", F.col("best.cid").alias("cid"))
    )


def _pq_query_table(
    codebook: DataFrame, queries: list[tuple[int, list[float]]], dim: int, m: int
) -> DataFrame:
    """The ADC lookup table: per (query, sub, cid), the squared L2 between
    the query's subvector and the codebook entry — n_centroids * m rows per
    query, broadcastable at any corpus size."""
    d_sub = dim // m
    qdf = _queries_df(codebook.sparkSession, queries)
    return qdf.crossJoin(F.broadcast(codebook)).select(
        "query_id",
        "sub",
        "cid",
        _l2sq(
            F.slice(F.col("qv"), F.col("sub") * d_sub + 1, d_sub).cast("array<double>"),
            F.col("cvec").cast("array<double>"),
        ).alias("qd"),
    )


def _rank_topk_dist(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "dist", "rank")
    )


def pq_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: list[tuple[int, list[float]]],
    dim: int,
    m: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: per query, a (sub, cid) ->
    squared-L2 lookup table (n_centroids * m rows — broadcastable at any
    corpus size), joined to the codes and summed per doc. The scan never
    touches float vectors — the whole search runs on the 8-int codes, which
    is the PQ bandwidth win. -> (query_id, vec_id, dist, rank), dist
    rounded 6dp BEFORE ranking (ASC, ties by id)."""
    qtab = _pq_query_table(codebook, queries, dim, m)
    scored = (
        codes.join(F.broadcast(qtab), ["sub", "cid"])
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("qd"), 6).alias("dist"))
    )
    return _rank_topk_dist(scored, k, id_col)


def ivfpq_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    codes: DataFrame,
    codebook: DataFrame,
    queries: list[tuple[int, list[float]]],
    dim: int,
    m: int = 8,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF × PQ — the production ANN composition (Jegou et al. 2011's
    IVFADC): the coarse quantizer prunes the scan to each query's n_probe
    nearest lists, and the surviving candidates are scored by the PQ ADC
    lookup table on their m small-int codes — the search never touches a
    float vector, combining IVF's scan pruning with PQ's 48x bandwidth win.

    Plan: list selection is a driver-side numpy matmul against the tiny
    centroid matrix (as ivf_topk); candidates = one broadcast (query_id,
    list_id) probe join against the assignment relation; scoring = one
    broadcast ADC-table join + a partial-aggregable groupBy sum over the
    codes. At 10^10 vectors, store `codes` co-partitioned with `assigned`
    on list_id so the candidate join is partition-pruned; every broadcast
    side here is O(queries * n_centroids * m) regardless of corpus size.
    -> (query_id, vec_id, dist, rank), dist rounded 6dp (ASC, ties by id).
    """
    cents = np.asarray(centroids, dtype=np.float64)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    probes = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        for lid in np.argsort(-(cn @ v))[:n_probe].tolist():
            probes.append((int(qid), int(lid)))
    spark = assigned.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, list_id int")
    cand = (
        assigned.select(id_col, "list_id")
        .join(F.broadcast(probe_df), "list_id")
        .select("query_id", id_col)
    )
    qtab = _pq_query_table(codebook, queries, dim, m)
    scored = (
        codes.join(cand, id_col)
        .join(F.broadcast(qtab), ["query_id", "sub", "cid"])
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("qd"), 6).alias("dist"))
    )
    return _rank_topk_dist(scored, k, id_col)


def pq_refine(
    embeddings: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd step over the PQ codebook: assign every subvector to its
    nearest centroid (pq_index), then move each centroid to the element-wise
    MEAN of its assigned subvectors (posexplode -> groupBy(sub, cid, pos)
    avg -> collect back in position order — all partial-aggregable, no
    window). Components round 6dp so the refined codebook is cross-engine
    deterministic. Centroids that attracted no vectors keep their old
    position (left join + per-position coalesce via map lookup is
    unnecessary: a cid absent from the assignment simply keeps its original
    row through the anti-join union). Iterate k times for k-means; one step
    already separates the sha-bootstrap clusters materially (see
    tests/test_simsearch.py recall assertion)."""
    d_sub = dim // m
    codes = pq_index(embeddings, codebook, dim=dim, m=m, id_col=id_col, vec_col=vec_col)
    subs = F.array(*[F.lit(j) for j in range(m)])
    sv = embeddings.select(
        F.col(id_col), F.explode(subs).alias("sub"), F.col(vec_col).alias("__v")
    ).select(
        id_col,
        "sub",
        F.slice(F.col("__v"), F.col("sub") * d_sub + 1, d_sub).alias("svec"),
    )
    assigned = codes.join(sv, [id_col, "sub"]).select(
        "sub", "cid", F.posexplode(F.col("svec").cast("array<double>")).alias("pos", "x")
    )
    moved = (
        assigned.groupBy("sub", "cid", "pos")
        .agg(F.round(F.avg("x"), 6).alias("mu"))
        .groupBy("sub", "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))), lambda s: s["mu"]
            ).alias("cvec")
        )
    )
    untouched = codebook.join(moved.select("sub", "cid"), ["sub", "cid"], "left_anti")
    return moved.unionByName(
        untouched.select("sub", "cid", F.col("cvec").cast("array<double>").alias("cvec"))
    )
