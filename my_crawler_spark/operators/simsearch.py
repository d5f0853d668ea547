"""Similarity search over embedding columns (array<float>).

- brute_force_topk : exact cosine top-k per query — the correctness
  baseline; one scan + TakeOrderedAndProject, JVM-side arithmetic
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
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .search import cosine


def brute_force_topk(
    embeddings: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (query_id, vec_id, cos, rank) for each query vector."""
    parts = []
    for qid, vec in queries:
        q = F.array(*[F.lit(float(x)) for x in vec])
        scored = embeddings.select(
            F.lit(qid).alias("query_id"),
            F.col(id_col),
            cosine(F.col(vec_col), q).alias("cos"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
        parts.append(
            scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _srp_planes(dim: int, n_bits: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).astype(np.float64)


def _bucket_expr(vec_col: str, planes: np.ndarray) -> F.Column:
    """Sign-random-projection bucket id as a pure column expression:
    bit_i = (Σ_j v_j * p_ij) > 0, assembled into an int. JVM-side."""
    n_bits, dim = planes.shape
    acc = F.lit(0).cast("long")
    for i in range(n_bits):
        dot = sum(
            (F.element_at(F.col(vec_col), j + 1) * float(planes[i, j]) for j in range(dim)),
            F.lit(0.0),
        )
        acc = acc.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return acc


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
    bucket) so probes become partition-pruned scans."""
    planes = _srp_planes(dim, n_bits, n_tables, seed)
    parts = []
    for t in range(n_tables):
        parts.append(
            embeddings.select(
                F.lit(t).alias("table"),
                _bucket_expr(vec_col, planes[t]).alias("bucket"),
                F.col(id_col),
                F.col(vec_col),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    """Probe each query's buckets across tables, exact-rescore the union."""
    planes = _srp_planes(dim, n_bits, n_tables, seed)
    probes = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float64)
        for t in range(n_tables):
            bits = 0
            for i in range(n_bits):
                if float(planes[t, i] @ v) > 0:
                    bits |= 1 << i
            probes.append((qid, t, bits))
    probe_df = index.sparkSession.createDataFrame(
        probes, "query_id long, table int, bucket long"
    )
    cands = index.join(
        F.broadcast(probe_df), ["table", "bucket"]
    ).select("query_id", id_col, vec_col).distinct()
    qmap = {qid: vec for qid, vec in queries}
    parts = []
    for qid, vec in qmap.items():
        q = F.array(*[F.lit(float(x)) for x in vec])
        parts.append(
            cands.filter(F.col("query_id") == qid).withColumn(
                "cos", cosine(F.col(vec_col), q)
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


def ivf_index(
    embeddings: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: centroids = deterministic sample (every
    n/n_lists-th vector by id order), assignment by max cosine (one pass)."""
    n = embeddings.count()
    step = max(n // n_lists, 1)
    cents = (
        embeddings.select(id_col, vec_col)
        .withColumn("__rn", F.row_number().over(Window.orderBy(id_col)))
        .filter((F.col("__rn") % step == 0) & (F.col("__rn") / step <= n_lists))
        .collect()
    )
    centroids = [list(map(float, r[vec_col])) for r in cents]
    best = None
    for li, c in enumerate(centroids):
        cv = F.array(*[F.lit(x) for x in c])
        s = cosine(F.col(vec_col), cv)
        cur = F.struct(s.alias("s"), F.lit(li).alias("list_id"))
        best = cur if best is None else F.when(cur["s"] > best["s"], cur).otherwise(best)
    assigned = embeddings.withColumn("list_id", best["list_id"])
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
    cents = np.asarray(centroids, dtype=np.float64)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    parts = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        lists = np.argsort(-(cn @ v))[:n_probe].tolist()
        q = F.array(*[F.lit(float(x)) for x in vec])
        parts.append(
            assigned.filter(F.col("list_id").isin(lists))
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col),
                cosine(F.col(vec_col), q).alias("cos"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )
