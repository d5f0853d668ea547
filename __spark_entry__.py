"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship hybrid-search pipeline (R1-R10) over
  /root/testdata/sf0.001 — BM25 + dense cosine candidates, weighted RRF
  fusion, ranking boosts, dedup/diversify, pagination.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  (SURVEY.md §2); SQL-expressible ones carry a DuckDB oracle twin, the
  rest are rows-only (minhash/simhash/LSH/IVF/image-decode — hash
  functions or binary payloads DuckDB can't reproduce; their *invariants*
  ARE oracled via the `*_sound` violation entries, and the full crawl-gate
  semantics via `crawl_gates`, a sequential recursive-CTE replay of the
  reference loop).

Implementation lives in my_crawler_spark/entry_queries.py (checked-in
package); this file is the thin driver-facing shim.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from my_crawler_spark import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full search pipeline over sf0.001 documents+embeddings."""
    sf_dir = "/root/testdata/sf0.001"
    from my_crawler_spark.operators import search as S

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = "data table scan engine"

    bm25 = S.topk(S.bm25_scores(docs, query), "bm25", 40, "doc_id")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    dense = S.topk(
        S.dense_scores(emb.withColumnRenamed("vec_id", "doc_id"), list(qvec),
                       id_col="doc_id"),
        "cos", 40, "doc_id",
    )
    fused = S.rrf_fuse([(dense, 2.0), (bm25, 2.0), (bm25, 1.0)], "doc_id")
    ranked = S.topk(fused, "rrf_score", 40, "doc_id")
    enriched = ranked.join(docs, "doc_id").select(
        "doc_id",
        F.col("rank").alias("rank_in"),
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
                 F.col("doc_id").cast("string")).alias("source_url"),
        F.substring(F.col("text"), 1, 60).alias("page_title"),
        F.substring(F.col("text"), 1, 200).alias("description"),
        F.col("rrf_score").alias("score"),
    )
    boosted = S.apply_ranking_boosts(enriched, query)
    reranked = S.topk(boosted.drop("rank_in"), "score", 40, "doc_id")
    final = S.paginate(
        S.unique_pages_diversified(reranked), limit=10, offset=0
    )
    return final.select("out_rank", "doc_id", "source_url", "page_title",
                        F.round("score", 4).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
