"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents whose hashed n-gram feature distribution looks
like a small TARGET corpus (e.g. "pick the 10B web pages that look most like
Wikipedia"). The published recipe, re-expressed as four declarative stages:

1. features: unigrams + word-bigrams hashed into B buckets (the paper uses
   10k hashed buckets; here the bucket is the first `prefix_len` hex chars
   of sha256(term) — B = 16^prefix_len — so the DuckDB oracle reproduces
   the bucketing exactly without a cross-engine integer-hash twin).
2. bag-of-hashed-ngrams models for target and raw: add-one-smoothed bucket
   probabilities from two groupBy counts.
3. per-doc importance weight log w(d) = sum_b c_b(d) * (log p_target(b) -
   log p_raw(b)) — one bucket-keyed join + one groupBy(doc) sum.
4. Gumbel-top-k resampling: the paper samples without replacement with
   probability proportional to w; the Gumbel-max trick makes that a
   deterministic top-k on key = log w + Gumbel(g), and we derive g from
   sha256(doc_id) so the "sample" is a pure function of the data
   (reproducible across retries, engines, cluster sizes — the same
   reasoning as sampling.hash_sample).

Cross-engine float discipline (see lm.py): per-bucket log-ratios rounded to
9dp before the per-doc sum; the sum rounded to 6dp; the Gumbel key rounded
9dp (its inputs are exact: sha-derived 48-bit integer / 2^48); the final
selection key rounded 6dp. The DuckDB twin hash-matches values.

At 100 TB: stages 1-2 are token-traffic shuffles (same class as the MinHash
shingle pipeline); the lambda relation is B rows (256 at prefix_len=2,
65k at 4) — always broadcastable; stage 3 is one shuffle on doc_id; stage 4
is a distributed top-k (TakeOrderedAndProject: per-partition heaps + one
merge, no global sort, no single-task window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ngrams_from_tokens, tokens


def hashed_term_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 2,
) -> DataFrame:
    """(id, bucket) — one row per unigram/bigram OCCURRENCE, bucketed by a
    sha256 hex prefix. Two-step select so the bigram lambda does not
    re-tokenize per element (dedup.ngrams_from_tokens contract)."""
    toked = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    terms = toked.select(
        F.col(id_col),
        F.explode(
            F.concat(F.col("_toks"), ngrams_from_tokens(F.col("_toks"), 2))
        ).alias("term"),
    )
    return terms.select(
        F.col(id_col),
        F.substring(F.sha2(F.col("term"), 256), 1, prefix_len).alias("bucket"),
    )


def bucket_log_ratio(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    text_col: str = "text",
    prefix_len: int = 2,
) -> DataFrame:
    """(bucket, lam) where lam = log p_target(bucket) - log p_raw(bucket)
    under add-one smoothing over the FIXED domain of B = 16^prefix_len
    buckets. The domain is the raw corpus's observed buckets — a bucket no
    raw doc references is never looked up, so it needs no row; B still
    enters both denominators so absent buckets cost nothing but smoothing
    mass. Rounded 9dp (cross-engine libm discipline)."""
    tc = (
        hashed_term_buckets(target_docs, text_col=text_col, prefix_len=prefix_len)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    rc = (
        hashed_term_buckets(raw_docs, text_col=text_col, prefix_len=prefix_len)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("rc"))
    )
    return _bucket_log_ratio_from_counts(tc, rc, prefix_len)


def _bucket_log_ratio_from_counts(
    tc: DataFrame, rc: DataFrame, prefix_len: int
) -> DataFrame:
    """bucket_log_ratio's arithmetic over precomputed (bucket, tc)/(bucket,
    rc) count relations — lets dsir_log_weights derive rc from the one
    persisted raw-feature pass instead of re-exploding the raw corpus."""
    n_buckets = float(16**prefix_len)
    totals = rc.crossJoin(tc.select(F.sum("tc").alias("t_total"))).select(
        "bucket", "rc", "t_total"
    )
    # raw buckets define the domain; target counts fill in with 0
    joined = totals.join(tc, "bucket", "left").na.fill({"tc": 0})
    r_total = rc.agg(F.sum("rc").alias("r_total"))
    return joined.crossJoin(r_total).select(
        "bucket",
        F.round(
            F.log(F.col("tc") + F.lit(1.0))
            - F.log(F.col("t_total") + F.lit(n_buckets))
            - F.log(F.col("rc") + F.lit(1.0))
            + F.log(F.col("r_total") + F.lit(n_buckets)),
            9,
        ).alias("lam"),
    )


def dsir_log_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 2,
) -> DataFrame:
    """(id, n_terms, log_w) importance log-weights for every raw doc with at
    least one token (a zero-token doc has no feature evidence — callers
    wanting them back left-join). log_w = round(sum of per-occurrence
    lambda, 6)."""
    from pyspark import StorageLevel

    # ONE raw-corpus feature pass: the (id, bucket) occurrence relation
    # feeds both the raw bucket counts (rc, via map-side partial agg) and
    # the per-doc weight join — without the persist each consumer re-ran
    # the tokenize + bigram + sha256 explode over the whole raw corpus
    # (guide §1.2: don't compute things twice). Disk-backed so a
    # 100 TB-scale occurrence relation spills instead of evicting; one
    # materialization ~= the cost of the second pass it replaces.
    occ = hashed_term_buckets(
        raw_docs, id_col=id_col, text_col=text_col, prefix_len=prefix_len
    ).persist(StorageLevel.MEMORY_AND_DISK)
    rc = occ.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tc = (
        hashed_term_buckets(target_docs, text_col=text_col, prefix_len=prefix_len)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    lam = _bucket_log_ratio_from_counts(tc, rc, prefix_len)
    return (
        occ.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("lam"), 6).alias("log_w"),
        )
    )


def gumbel_key(id_col) -> F.Column:
    """Deterministic standard-Gumbel draw from sha256(id): u = (h48 + 0.5) /
    2^48 in (0,1), g = -ln(-ln(u)). Exact cross-engine: the 48-bit value and
    the division are exact doubles; the two ln() calls are rounded at 9dp."""
    from .sampling import hash_unit

    return F.round(-F.log(-F.log(hash_unit(id_col))), 9)


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 2,
) -> DataFrame:
    """Top-k Gumbel resample: (id, n_terms, log_w, sel_key) for the k raw
    docs with the largest round(log_w + gumbel, 6), ties broken by id.
    orderBy().limit(k) compiles to TakeOrderedAndProject — per-partition
    top-k heaps merged once, the scalable global-top-k physical shape."""
    w = dsir_log_weights(
        raw_docs, target_docs, id_col=id_col, text_col=text_col, prefix_len=prefix_len
    )
    keyed = w.withColumn(
        "sel_key", F.round(F.col("log_w") + gumbel_key(F.col(id_col)), 6)
    )
    return keyed.orderBy(F.desc("sel_key"), F.col(id_col)).limit(k)
