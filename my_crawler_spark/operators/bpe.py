"""Distributed BPE tokenizer training (Sennrich et al. 2016).

Training a subword tokenizer is a canonical large-corpus workload: ONE
heavy pass builds the word-frequency dict (at 100 TB this is the whole
cost — the dict itself is ~10^7-10^8 rows), then the merge loop runs over
the weighted dict only. This module keeps the merge loop fully
relational/JVM-side:

- pair counting   : explode adjacent symbol pairs weighted by word count,
                    one groupBy per iteration over the (small) dict
- best pair       : max count, ties to the lexicographically smallest
                    (left, right) — a deterministic total order both the
                    independent re-implementation and the oracle follow
- merge apply     : a pure `F.aggregate` fold over the symbol array
                    (greedy left-to-right, non-overlapping — the classic
                    rule), so training never leaves the JVM
- iteration state : the dict is parquet-checkpointed per merge (the
                    iterative-lineage lesson: persist/cache does NOT
                    truncate the analyzed plan; see operators/graph.py)

Corpus application (`bpe_tokenize`) IS per-row sequential by nature, so it
is the documented Arrow-batched slow path: one pandas_udf applying the
learned merge ranks with the standard lowest-rank-first loop.

Reference semantics (public): learn n_merges merges over word character
sequences (no end-of-word marker — this engine's documented convention),
count each word's pairs once per adjacent occurrence, weight by word
frequency, re-count after every merge.
"""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .dedup import tokens


def word_dict(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — the one corpus-wide pass."""
    toked = docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
    return toked.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def _merge_expr(syms, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) inside a
    symbol array, as one JVM aggregate fold: append each symbol unless the
    accumulator's last element is `left` AND that element was not itself
    just produced by this merge (tracked by folding (acc, merged_flags))."""
    merged = F.lit(left + right)

    def step(acc, x):
        prev = F.element_at(acc["out"], -1)
        can = (
            (F.size(acc["out"]) > 0)
            & ~acc["last_merged"]
            & (prev == F.lit(left))
            & (x == F.lit(right))
        )
        return F.struct(
            F.when(
                can,
                F.concat(F.slice(acc["out"], 1, F.size(acc["out"]) - 1), F.array(merged)),
            )
            .otherwise(F.concat(acc["out"], F.array(x)))
            .alias("out"),
            can.alias("last_merged"),
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("last_merged"),
    )
    return F.aggregate(syms, init, step, lambda acc: acc["out"])


def bpe_train(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` BPE merges -> [(rank, left, right, pair_freq)].

    Each iteration: one groupBy over the exploded adjacent pairs of the
    weighted dict, one bounded collect (the single best row), one JVM
    fold applying the merge, one parquet checkpoint. Stops early when no
    pair occurs twice. The returned list is bounded (n_merges rows) —
    driver-side by design, like a trained model's weights.
    """
    spark = docs.sparkSession
    d = word_dict(docs, text_col).select(
        "word", "cnt", F.split(F.col("word"), "").alias("syms")
    )
    tmp = tempfile.mkdtemp(prefix="bpe_train_")
    merges: list[tuple[int, str, str, int]] = []
    try:
        path = f"{tmp}/it0"
        d.write.parquet(path)
        cur = spark.read.parquet(path)
        for rank in range(n_merges):
            # NB: filter FIRST — Spark's sequence(1, 0) DESCENDS, so a
            # single-symbol word would otherwise emit a phantom (sym, NULL)
            # pair
            idx = F.sequence(F.lit(1), F.size("syms") - 1)
            pairs = cur.filter(F.size("syms") >= 2).select(
                "cnt",
                F.explode(
                    F.transform(
                        idx,
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            best = (
                pairs.groupBy("p.l", "p.r")
                .agg(F.sum("cnt").alias("freq"))
                .orderBy(F.desc("freq"), "l", "r")
                .limit(1)
                .collect()
            )
            if not best or best[0]["freq"] < 2:
                break
            left, right, freq = best[0]["l"], best[0]["r"], int(best[0]["freq"])
            merges.append((rank, left, right, freq))
            nxt = cur.select(
                "word", "cnt", _merge_expr(F.col("syms"), left, right).alias("syms")
            )
            path = f"{tmp}/it{rank + 1}"
            nxt.write.parquet(path)
            cur = spark.read.parquet(path)
        return merges
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        merges, "rank int, left string, right string, freq long"
    )


def bpe_apply_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference per-word apply (lowest-rank-first, the standard inference
    loop) — shared by bpe_tokenize's Arrow batches and the test/sound
    twins."""
    syms = list(word)
    while len(syms) >= 2:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge ALL non-overlapping occurrences of this pair, left to right
        pair = (syms[best], syms[best + 1])
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bpe_tokens array<string>) — the corpus-wide apply pass.
    Per-word merging is sequential by nature, so this is the documented
    Arrow slow path: one pandas_udf over the word array, with a per-batch
    word cache (Zipf makes most words repeats)."""
    ranks = {(l, r): k for k, l, r, _ in merges}
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf(ArrayType(StringType()))
    def apply_bpe(words: pd.Series) -> pd.Series:
        rk = bc.value
        cache: dict[str, list[str]] = {}

        def enc(ws):
            out = []
            for w in ws:
                if w not in cache:
                    cache[w] = bpe_apply_word(w, rk)
                out.extend(cache[w])
            return out

        return words.map(enc)

    toked = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_w"))
    return toked.select(F.col(id_col), apply_bpe(F.col("_w")).alias("bpe_tokens"))
