"""Text analysis operators for the documents table (training-data QC).

All pure column expressions (JVM/codegen) — no UDFs:

- lang_id_expr      : n-gram/stopword-hit heuristic language ID over the
  five fixture languages (en/de/fr/es/zh)
- quality_score_expr: length / punctuation-ratio / stopword-ratio composite
- token_count exprs : whitespace tokens + a BPE-ish regex token count
- doc_fingerprint   : winnowing-style fingerprint = min xxhash64 over
  word 8-grams (rolling-hash analogue, one explode)
- repetition_stats  : Gopher-family repetition signals (unique-token /
  top-2-gram / duplicate-8-gram fractions)
- pii_scrub         : C4-style PII count + redaction (email/phone/IPv4)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "dans"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "en", "un", "es"],
}
CJK_RANGE = r"[一-鿿]"


def _hit_count(words: Column, lang: str) -> Column:
    return F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def lang_id_expr(text: Column) -> Column:
    """Best-guess language code. CJK-character density beats stopword hits;
    otherwise the language with the most distinct stopword matches wins
    (ties resolved in en>de>fr>es order); no hits -> 'und'."""
    words = F.array_distinct(F.filter(F.split(F.lower(text), r"[^\p{L}0-9]+"), lambda t: t != ""))
    cjk = F.length(F.regexp_replace(text, "(?s)" + CJK_RANGE, "")) < F.length(text) * 0.7
    scores = [(lang, _hit_count(words, lang)) for lang in STOPWORDS]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, s in reversed(scores):  # earlier langs win ties (>=)
        cond = s >= F.greatest(best_score, F.lit(1))
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return F.when(cjk, F.lit("zh")).otherwise(best_lang)


def ws_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of GPT-2-style pretokenizer matches: word pieces, numbers,
    punctuation runs — a cheap, deterministic proxy for tokenizer cost."""
    pieces = F.regexp_extract_all(
        text, F.lit(r"(\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+)"), 0
    )
    return F.size(pieces)


def punct_ratio(text: Column) -> Column:
    no_punct = F.regexp_replace(text, r"[^\p{L}\p{N}\s]", "")
    return (F.length(text) - F.length(no_punct)) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    words = F.filter(F.split(F.lower(text), r"[^\p{L}0-9]+"), lambda t: t != "")
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    hits = F.size(
        F.filter(words, lambda w: w.isin(*all_stops))
    )
    return hits / F.greatest(F.size(words), F.lit(1))


def quality_score_expr(text: Column) -> Column:
    """[0,1] composite: length band + low punctuation + stopword presence.
    The exact blend is this engine's own contract (oracle-checked in SQL)."""
    n = F.length(text)
    len_score = F.when(n >= 200, F.lit(1.0)).otherwise(n / F.lit(200.0))
    p = punct_ratio(text)
    punct_score = F.when(p <= 0.1, F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (p - 0.1) * 5.0)
    )
    s = stopword_ratio(text)
    stop_score = F.least(s * 5.0, F.lit(1.0))
    return F.round((len_score + punct_score + stop_score) / 3.0, 6)


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8
) -> DataFrame:
    """(id, fingerprint) — min xxhash64 over word 8-grams; empty/short docs
    fingerprint the whole normalized text."""
    from .dedup import ngrams_from_tokens, tokens

    toked = docs.select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("_toks")
    )
    grammed = toked.select(
        F.col(id_col),
        F.col(text_col),
        ngrams_from_tokens(F.col("_toks"), n).alias("_grams"),
    )
    fp = F.when(
        F.size("_grams") > 0,
        F.array_min(F.transform(F.col("_grams"), lambda g: F.xxhash64(g))),
    ).otherwise(F.xxhash64(F.lower(F.col(text_col))))
    return grammed.select(F.col(id_col), fp.alias("fingerprint"))


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-family repetition quality signals per document (the filters a
    100 TB corpus pipeline runs before training; Rae et al. 2021 §A.1.1,
    FineWeb's repetition gates):

    - unique_token_frac : distinct tokens / tokens (low -> loops/boilerplate)
    - top2gram_frac     : tokens covered by the most frequent 2-gram / tokens
    - dup_8gram_frac    : 1 - distinct 8-grams / 8-grams

    unique/8-gram fractions are pure per-row array expressions (zero
    shuffle); the top-2-gram mode is one explode + keyed agg on id_col —
    the standard scalable shape (never an O(k^2) per-row filter scan).
    Line-level Gopher signals are omitted: this corpus is single-line by
    construction and they would be vacuously zero."""
    from .dedup import ngrams_from_tokens, tokens

    t = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    base = t.select(
        id_col,
        "toks",
        F.size("toks").alias("n_tokens"),
        ngrams_from_tokens(F.col("toks"), 2).alias("g2"),
        ngrams_from_tokens(F.col("toks"), 8).alias("g8"),
    )
    m2 = (
        base.select(id_col, F.explode_outer("g2").alias("gram"))
        .groupBy(id_col, "gram")
        .count()
        .groupBy(id_col)
        .agg(F.max(F.when(F.col("gram").isNotNull(), F.col("count")).otherwise(0)).alias("m2"))
    )
    denom = F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    return (
        base.join(m2, id_col)
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.size(F.array_distinct("toks")) / denom, 6).alias("unique_token_frac"),
            F.round(
                F.when(F.size("g2") > 0, F.col("m2") * 2 / denom).otherwise(0.0), 6
            ).alias("top2gram_frac"),
            F.round(
                F.when(
                    F.size("g8") > 0,
                    1 - F.size(F.array_distinct("g8")) / F.size("g8").cast("double"),
                ).otherwise(0.0),
                6,
            ).alias("dup_8gram_frac"),
        )
    )


PII_EMAIL = r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{1,2} \d{3}-\d{3}-\d{4}"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4-style PII scrubbing: count and redact emails, E.164-ish phone
    numbers and IPv4 literals. Pure regexp column expressions (codegen,
    zero shuffle, one pass over the corpus). The patterns avoid
    lookarounds on purpose so the exact same strings run under Java
    regex (Spark) and RE2 (the DuckDB oracle). Redaction order is fixed
    (email -> ip -> phone) and the patterns are mutually disjoint."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        scrubbed.alias("scrubbed"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): hash every word k-gram, slide a window of `window`
    consecutive k-gram hashes over the document and record the minimum
    hash of each window (with its position) — guaranteeing any shared run
    of >= k + window - 1 tokens between two documents shares at least one
    fingerprint, at ~2/(window+1) the storage of all k-grams.

    Ties are broken by position: the comparison key is the md5 hex hash
    concatenated with the zero-padded gram position, so the LEFTMOST
    minimal hash wins deterministically in both engines (md5 strings
    compare lexicographically identically in Spark and DuckDB).

    -> (doc_id, pos, fp) distinct picks; docs shorter than k tokens emit
    nothing (no gram to hash). One explode + two same-frame partitioned
    windows + one distinct — linear, no unpartitioned stage.
    """
    from .dedup import ngrams_from_tokens, tokens

    toked = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    grams = toked.select(
        F.col(id_col),
        F.posexplode(ngrams_from_tokens(F.col("toks"), k)).alias("pos", "gram"),
    ).select(
        id_col,
        "pos",
        F.concat(F.md5("gram"), F.lpad(F.col("pos").cast("string"), 10, "0")).alias(
            "hp"
        ),
    )
    from pyspark.sql import Window as W

    frame = (
        W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    )
    picks = grams.select(
        F.col(id_col),
        F.min("hp").over(frame).alias("pick"),
        F.count(F.lit(1)).over(frame).alias("cnt"),
    ).filter(F.col("cnt") == window)
    return (
        picks.select(
            id_col,
            F.substring("pick", 33, 10).cast("long").alias("pos"),
            F.substring("pick", 1, 32).alias("fp"),
        )
        .distinct()
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (score = tf * (ln((N+1)/(df+1)) + 1)) — the doc-level keyword extractor
    next to the chunk-level BM25 ranker.

    -> (doc_id, term, tf, df, score, rk), rk 1..k by score DESC, term ASC.

    Plan: one tokenize + explode, tf = groupBy (doc, term), df = groupBy
    term; N is a 1-row agg crossJoined in (no collect, no driver round
    trip). The df relation is term-keyed — a 100 TB vocab shuffle-joins,
    never broadcasts. Per-term ln() is rounded 9dp before the multiply
    (the cross-engine libm rule), the score 6dp for output; ranking uses
    the same rounded value both engines.
    """
    from .dedup import tokens

    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(n)
        .withColumn(
            "idf",
            F.round(
                F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0, 9
            ),
        )
        .withColumn("score", F.round(F.col("tf") * F.col("idf"), 6))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "df", "score", "rk")
    )


def hash_feature_weights(spark, dim: int = 4096) -> DataFrame:
    """Deterministic linear-model weight dim: (bucket_hex, w_milli).

    bucket_hex is the 3-hex-char feature bucket (dim = 16^3); w_milli is an
    INTEGER weight in millis ((b * 2654435761) % 1000 - 500, Knuth
    multiplicative constant) so per-doc sums are exact integer arithmetic —
    order-free across engines and shuffle plans. A real model would load
    trained weights into the same (bucket, weight) shape.
    """
    return spark.range(dim).select(
        F.lower(F.lpad(F.hex(F.col("id")), 3, "0")).alias("bucket_hex"),
        (F.pmod(F.col("id") * F.lit(2654435761), F.lit(1000)) - F.lit(500))
        .cast("long")
        .alias("w_milli"),
    )


def classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float = 0.5,
) -> DataFrame:
    """fastText-style linear quality classifier applied at corpus scale
    -> (doc_id, n_tokens, logit, prob, keep).

    The CCNet/LLaMA-curation shape: hashing-trick featurization (bucket =
    first 3 hex chars of sha256(token), all codegen), a weights DIM joined
    in (broadcast at 4096 rows; a 10^7-bucket model shuffle-joins on the
    bucket key), mean-pooled logit, sigmoid gate. No Python stage anywhere.

    Cross-engine determinism: the pooled sum is INTEGER millis (exact,
    order-free); logit = round(sum / (1000*n), 6) and prob =
    round(sigmoid(logit), 6) follow the rounded-input libm rule.
    """
    from .dedup import tokens

    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).withColumn("bucket_hex", F.substring(F.sha2(F.col("term"), 256), 1, 3))
    pooled = (
        tok.join(F.broadcast(weights), "bucket_hex")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_milli").alias("sum_milli"),
        )
    )
    logit = F.round(
        F.col("sum_milli").cast("double")
        / (F.lit(1000.0) * F.col("n_tokens").cast("double")),
        6,
    )
    return (
        pooled.withColumn("logit", logit)
        .withColumn(
            "prob", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 6)
        )
        .withColumn("keep", F.col("prob") >= F.lit(keep_threshold))
        .select(id_col, "n_tokens", "logit", "prob", "keep")
    )


def normalize_text(col: F.Column) -> F.Column:
    """JVM-side normalization: strip C0 controls (except tab/newline/CR,
    which are whitespace), collapse ASCII whitespace runs to one space,
    trim. Explicit char classes, not `\\s` — Java's `\\s` includes \\x0b
    while RE2's does not, and the DuckDB oracle replays these regexes
    verbatim. (NFC composition is the Python stage in `normalize_corpus` —
    there is no JVM NFC expression.)"""
    stripped = F.regexp_replace(col, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    return F.trim(F.regexp_replace(stripped, r"[ \t\n\r]+", " "))


def normalize_corpus(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode NFC + whitespace/control cleanup for a raw web corpus
    -> (doc_id, norm_text, changed).

    Control-strip and whitespace-collapse run in codegen; NFC composition
    is one Arrow-batched pandas_udf (the only step Spark lacks an
    expression for). Row-local, no shuffle — the map stage fuses into
    whatever consumes it.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    cleaned = normalize_text(_nfc(F.col(text_col)))
    return docs.select(
        F.col(id_col),
        cleaned.alias("norm_text"),
        (cleaned != F.col(text_col)).alias("changed"),
    )


def blocklist_stats(
    docs: DataFrame,
    blockwords: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style badwords gate (Raffel et al. 2020 §2.2: drop any page
    containing a word from a blocklist). Emits per-doc evidence instead of
    silently dropping: (id, n_hits = total blocked-token OCCURRENCES,
    matched = sorted csv of distinct blocked tokens, keep = n_hits == 0) —
    the apply step is `.filter("keep")`.

    The blocklist is token-level (the word-boundary tokenizer shared with
    lang-id/dedup) and compiled INTO the expression as an array literal —
    real-world lists are a few thousand words, far below literal-plan
    limits, so there is no join, no broadcast build, no shuffle: a pure
    projection that scales like the scan itself."""
    from .dedup import tokens

    block = F.array(*[F.lit(w) for w in blockwords])
    toked = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    hits = F.filter(F.col("_toks"), lambda t: F.array_contains(block, t))
    return toked.select(
        F.col(id_col),
        F.size(hits).cast("long").alias("n_hits"),
        F.array_join(F.array_sort(F.array_distinct(hits)), ",").alias("matched"),
        (F.size(hits) == 0).alias("keep"),
    )


def pmi_top_pairs(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k word collocations by pointwise mutual information (Church &
    Hanks 1990) — the association-mining pass that surfaces multiword
    expressions ("san francisco") for tokenizer/phrase-vocab curation.

    PMI(w1,w2) = ln(p(w1,w2) / (p(w1) p(w2))) with bigram probabilities
    over the bigram total and unigram probabilities over the token total,
    computed as ONE rounded-9dp log expression from exact counts (the
    cross-engine contract). min_count filters the unstable low-frequency
    tail (classic PMI failure mode: hapax pairs score highest). Plan: the
    bigram/unigram shuffles of every n-gram op here, then a distributed
    top-(k) orderBy+limit — ties broken (w1, w2)."""
    from .dedup import tokens

    toked = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    uni = (
        toked.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ucnt"))
    )
    idx = F.sequence(F.lit(1), F.size("toks") - 1)
    big = (
        toked.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("w1"),
                        F.element_at("toks", i + 1).alias("w2"),
                    ),
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    bcnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bcnt"))
    totals = bcnt.agg(F.sum("bcnt").cast("double").alias("bt")).crossJoin(
        uni.agg(F.sum("ucnt").cast("double").alias("ut"))
    )
    scored = (
        bcnt.filter(F.col("bcnt") >= min_count)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("ucnt", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("ucnt", "c2"), "w2")
        .crossJoin(totals)
        .select(
            "w1",
            "w2",
            F.col("bcnt"),
            F.round(
                F.log(F.col("bcnt") / F.col("bt"))
                - F.log(F.col("c1") / F.col("ut"))
                - F.log(F.col("c2") / F.col("ut")),
                9,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(k)
