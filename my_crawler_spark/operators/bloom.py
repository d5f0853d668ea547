"""Distributed-built broadcast Bloom filter for the URL-seen prefilter.

north_rule: "broadcast bloom/cuckoo URL-seen filter" in front of the exact
``url_seen`` anti-join (Q4, crawl_loop.rs:258-272). Policy: the bloom only
*prunes* — rows the bloom says "definitely unseen" skip the exact anti-join
entirely; "maybe seen" rows still go through the authoritative anti-join,
so false positives cost a join probe, never a wrong answer.

Hashing strategy: the two base hashes are computed JVM-side
(``xxhash64(key, seed)`` — whole-stage codegen), and the k bit positions
derive from them with Kirsch-Mitzenmacher double hashing **vectorized in
numpy** inside the Arrow batch — no per-row Python anywhere.

Build is distributed: each partition folds its (h1, h2) pairs into a local
bitset (mapInPandas), the driver ORs the per-partition bitsets and
broadcasts. Cost model at 10^10 keys: a flat 1% fpp bloom is ~12 GiB —
too big to broadcast; the documented scale path is a *banked* bloom
partitioned by ``hash(host) % B`` so each executor only loads the banks
for its host-buckets (~12 GiB / B each), plus Catalyst's runtime bloom
join (enabled in session.py) as backstop. This module implements the
single-bank version with the same interface.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, StructField, StructType

_SEED1, _SEED2 = 0x51ED, 0xC0FFEE


def _hash_cols(col):
    """Two JVM-side 64-bit hashes of the key column."""
    return (
        F.xxhash64(col, F.lit(_SEED1)),
        F.xxhash64(col, F.lit(_SEED2)),
    )


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via double hashing, fully vectorized."""
    h1 = h1.astype(np.uint64)
    h2 = h2.astype(np.uint64) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


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

    def contains_pairs(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions(h1, h2, self.k, self.m)
        return np.all(
            self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8), axis=1
        )

    # convenience for tests
    def might_contain_key(self, key: str) -> bool:
        import pandas as _pd

        # mirror xxhash64 is JVM-side; tests go through the DataFrame API
        raise NotImplementedError("probe via bloom_maybe_seen on a DataFrame")


def build_bloom(
    df: DataFrame, key_col: str, expected_n: int | None = None, fpp: float = 0.01
) -> BloomFilter:
    """Distributed build: per-partition bitsets ORed on the driver."""
    if expected_n is None:
        expected_n = df.count() or 1
    m, k = BloomFilter.params(expected_n, fpp)
    h1, h2 = _hash_cols(F.col(key_col))
    hashed = df.select(h1.alias("__h1"), h2.alias("__h2"))
    schema = StructType([StructField("bits", BinaryType())])

    def fold(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(m // 8, dtype=np.uint8)
        any_rows = False
        for pdf in it:
            if len(pdf):
                any_rows = True
                pos = _positions(
                    pdf["__h1"].to_numpy(np.int64), pdf["__h2"].to_numpy(np.int64), k, m
                ).ravel()
                np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = hashed.mapInPandas(fold, schema).collect()
    acc = np.zeros(m // 8, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row.bits, dtype=np.uint8)
    return BloomFilter(acc, k)


def bloom_maybe_seen(
    spark: SparkSession, df: DataFrame, key_col: str, bloom: BloomFilter, out_col: str
) -> DataFrame:
    """Adds ``out_col``: True = maybe-seen (needs the exact anti-join),
    False = definitely new. JVM hashes -> numpy membership, Arrow-batched."""
    bc = spark.sparkContext.broadcast((bloom.bits.tobytes(), bloom.k))

    @F.pandas_udf(BooleanType())
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits_bytes, k = bc.value
        bf = BloomFilter(np.frombuffer(bits_bytes, dtype=np.uint8), k)
        return pd.Series(
            bf.contains_pairs(h1.to_numpy(np.int64), h2.to_numpy(np.int64))
        )

    c1, c2 = _hash_cols(F.col(key_col))
    return df.withColumn(out_col, probe(c1, c2))


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
