"""Distributed-built broadcast Bloom filter for the URL-seen prefilter.

north_rule: "broadcast bloom/cuckoo URL-seen filter" in front of the exact
``url_seen`` anti-join (Q4, crawl_loop.rs:258-272). Policy: the bloom only
*prunes* — rows the bloom says "definitely unseen" skip the exact anti-join
entirely; "maybe seen" rows still go through the authoritative anti-join,
so false positives cost a join probe, never a wrong answer.

Build is distributed: each partition folds its keys into a local bitset
inside an Arrow batch (mapInPandas), the driver ORs the per-partition
bitsets and broadcasts the result. Cost model at 10^10 keys: a flat bloom
at 1% fpp is ~12 GiB — too big to broadcast; the documented scale path is
a *banked* bloom partitioned by ``hash(host) % B`` so each executor only
needs the banks for the host-buckets it processes (bank size ~12 GiB / B),
plus Catalyst's runtime bloom join (enabled in session.py) as backstop.
This module implements the single-bank version with the same interface.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, StructField, StructType


def _positions(key: str, k: int, m: int) -> np.ndarray:
    """k bit positions via double hashing over sha1(key) (Kirsch-Mitzenmacher)."""
    d = hashlib.sha1(key.encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1
    return np.array([(h1 + i * h2) % m for i in range(k)], dtype=np.int64)


def _batch_positions(keys: pd.Series, k: int, m: int) -> np.ndarray:
    return np.concatenate([_positions(s, k, m) for s in keys]) if len(keys) else np.empty(0, np.int64)


class BloomFilter:
    def __init__(self, bits: np.ndarray, k: int):
        self.bits = bits  # uint8 array, length m/8
        self.k = k
        self.m = len(bits) * 8

    @staticmethod
    def params(expected_n: int, fpp: float = 0.01) -> tuple[int, int]:
        m = max(64, int(-expected_n * math.log(fpp) / (math.log(2) ** 2)))
        m = (m + 7) // 8 * 8
        k = max(1, round(m / max(expected_n, 1) * math.log(2)))
        return m, k

    def might_contain(self, key: str) -> bool:
        pos = _positions(key, self.k, self.m)
        return bool(np.all(self.bits[pos >> 3] & (1 << (pos & 7).astype(np.uint8))))

    def contains_batch(self, keys: pd.Series) -> pd.Series:
        if not len(keys):
            return pd.Series([], dtype=bool)
        out = np.ones(len(keys), dtype=bool)
        for i, s in enumerate(keys):
            pos = _positions(s, self.k, self.m)
            out[i] = np.all(self.bits[pos >> 3] & (1 << (pos & 7).astype(np.uint8)))
        return pd.Series(out)


def build_bloom(
    df: DataFrame, key_col: str, expected_n: int | None = None, fpp: float = 0.01
) -> BloomFilter:
    """Distributed build: per-partition bitsets ORed on the driver.

    ``expected_n`` defaults to a cheap count() of df — at scale pass the
    running row-count kept in the metrics table instead.
    """
    if expected_n is None:
        expected_n = df.count() or 1
    m, k = BloomFilter.params(expected_n, fpp)

    schema = StructType([StructField("bits", BinaryType())])

    def fold(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(m // 8, dtype=np.uint8)
        any_rows = False
        for pdf in it:
            keys = pdf[key_col].dropna()
            if len(keys):
                any_rows = True
                pos = _batch_positions(keys, k, m)
                np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.select(key_col).mapInPandas(fold, schema).collect()
    acc = np.zeros(m // 8, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row.bits, dtype=np.uint8)
    return BloomFilter(acc, k)


def bloom_maybe_seen(
    spark: SparkSession, df: DataFrame, key_col: str, bloom: BloomFilter, out_col: str
) -> DataFrame:
    """Adds ``out_col``: True = maybe-seen (needs the exact anti-join),
    False = definitely new. Arrow-batched scalar pandas UDF."""
    bc = spark.sparkContext.broadcast((bloom.bits.tobytes(), bloom.k))

    @F.pandas_udf(BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        bits_bytes, k = bc.value
        bf = BloomFilter(np.frombuffer(bits_bytes, dtype=np.uint8), k)
        return bf.contains_batch(keys.fillna(""))

    return df.withColumn(out_col, probe(F.col(key_col)))


def anti_join_with_bloom(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame,
    key_cols: list[str],
    bloom: BloomFilter | None,
    bloom_key: str,
) -> DataFrame:
    """Q4's enqueue-dedup: candidates minus seen, bloom-pruned.

    definitely-new rows bypass the shuffle of the exact anti-join; only
    maybe-seen rows are joined. Falls back to a plain left_anti when no
    bloom is supplied.
    """
    if bloom is None:
        return candidates.join(seen, key_cols, "left_anti")
    tagged = bloom_maybe_seen(spark, candidates, bloom_key, bloom, "__maybe_seen")
    fresh = tagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    suspect = tagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    return fresh.unionByName(suspect.join(seen, key_cols, "left_anti"))
