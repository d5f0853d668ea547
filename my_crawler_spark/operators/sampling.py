"""Deterministic sampling for training-data curation.

A 100 TB pipeline samples constantly — held-out eval splits, per-language
quotas, ablation subsets — and `F.rand()` is the wrong tool: it is
non-reproducible across retries/stage re-execution (a recomputed partition
draws new randomness, so a lost executor silently changes the sample).
These operators key every decision on a cryptographic hash of a stable id,
so the sample is a pure function of the data: reproducible across runs,
engines (the DuckDB oracles run the same expression), and cluster sizes.

- hash_fraction     : uniform-in-[0,1) sort/threshold key from any id column
                      (first 12 hex chars of sha256 — lexicographic compare
                      on fixed-width lowercase hex == numeric compare)
- hash_sample       : keep rows with hash_fraction < rate. A pure filter —
                      no shuffle, pushes to the scan, trivially scales.
- split_assign      : named train/val/test-style splits from cumulative
                      rate boundaries, same hash key (one pass, no shuffle).
- stratified_sample : deterministic top-`quota` per stratum ordered by the
                      hash (one shuffle on the stratum key). For mega-strata
                      where quota << stratum size, pre-thin with hash_sample
                      at a safe oversample rate first so the window sorts a
                      bounded set — the two compose because both order by
                      the SAME hash key (prefix-stability: the top-k by hash
                      survives any hash-prefix filter that keeps >= k rows).
- mixture_plan /    : source-mixture rebalancing (DoReMi/Pile-style domain
  apply_mixture       reweighting) — largest downsample-only corpus hitting
                      target weights, applied via per-source hash thresholds.
- pack_sequences    : GPT-style concat-and-chunk packing into fixed-token
                      training sequences (per-shard window cumsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_WIDTH = 12  # 48 bits of the digest: plenty below float precision loss


def hash_fraction(col) -> F.Column:
    """THE deterministic sampling key for the whole engine: the first 12
    hex chars of sha256(CAST(col AS STRING)).

    Cross-engine-reproducibility policy: every data-dependent *sample* —
    hash sampling, split assignment, IVF/PQ/SemDeDup centroid picks —
    derives from this one key, because sha256 has bit-exact twins in
    DuckDB (`substr(sha256(CAST(x AS VARCHAR)), 1, 12)`), Python
    (`hashlib.sha256`), and Spark (`sha2`), so oracles and resumed or
    re-executed partitions re-derive identical choices. xxhash64 is
    reserved for *non-oracled internal* hashing (bloom banks, minhash
    permutations, salt groups) where speed matters and no other engine
    ever needs to replay the value — it has no DuckDB twin."""
    return F.substring(F.sha2(col.cast("string"), 256), 1, _HEX_WIDTH)


def _hex_threshold(rate: float) -> str:
    v = int(rate * (1 << (4 * _HEX_WIDTH)))
    if v >= (1 << (4 * _HEX_WIDTH)):
        # rate == 1.0 must keep EVERY key: a 13-char "1000…" compares
        # lexicographically BELOW every 12-char hex key, so use a sentinel
        # above the hex alphabet instead ('g' > 'f' > any hex char)
        return "g"
    return format(v, f"0{_HEX_WIDTH}x")


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Deterministic ~`rate` sample keyed on sha256(key_col)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.where(hash_fraction(F.col(key_col)) < F.lit(_hex_threshold(rate)))


def split_assign(df: DataFrame, key_col: str, splits: dict[str, float]) -> DataFrame:
    """Adds a `split` column assigning each row to one named split by
    cumulative rate boundaries over the hash key (rates must sum to <= 1;
    remainder rows get NULL — 'unassigned'). Stable under re-execution and
    under adding MORE splits later from the remainder."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError("split rates sum above 1")
    key = hash_fraction(F.col(key_col))
    expr = F.lit(None).cast("string")
    cum = 0.0
    bounds = []
    for name, rate in splits.items():
        cum += rate
        # float summation noise (0.8+0.1+0.1 == 0.9999999999999999) must not
        # strand boundary keys: snap a within-epsilon-of-1 bound to exactly 1
        bounds.append((name, _hex_threshold(1.0 if cum >= 1.0 - 1e-9 else cum)))
    for name, hi in reversed(bounds):
        expr = F.when(key < F.lit(hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, quota: int
) -> DataFrame:
    """Deterministic `quota` rows per stratum: the quota smallest hash keys
    within each stratum (ties broken by the key itself). One shuffle."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_fraction(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def _hex_threshold_col(rate) -> F.Column:
    """Column form of _hex_threshold: 12-char lowercase hex of
    trunc(rate * 2^48), 'g' sentinel at rate >= 1 (see hash_sample)."""
    v = F.floor(rate * F.lit(float(1 << (4 * _HEX_WIDTH)))).cast("long")
    return F.when(rate >= 1.0, F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(v), _HEX_WIDTH, "0"))
    )


def mixture_plan(
    docs: DataFrame, weights: dict[str, float], source_col: str = "source"
) -> DataFrame:
    """Source-mixture rebalancing plan (the domain-reweighting step of a
    DoReMi/Pile-style pipeline): given target mixture weights, find the
    LARGEST corpus achievable by downsampling only (no upsampling) and
    each source's keep rate.

        T           = min over weighted sources of available_s / w_s
        keep_rate_s = min(1, w_s * T / available_s)

    Returns (source, available, weight, keep_rate). All DataFrame-side:
    one groupBy(source) count + one scalar min + a broadcast of the tiny
    plan — no collect, no driver loop. Sources absent from `weights` are
    excluded (weight 0); weighted sources absent from the corpus cannot
    constrain T (nothing to sample from them is representable without
    upsampling, which this plan never does)."""
    spark = docs.sparkSession
    w_df = spark.createDataFrame(
        list(weights.items()), f"{source_col} string, weight double"
    )
    avail = docs.groupBy(source_col).agg(F.count("*").alias("available"))
    j = avail.join(F.broadcast(w_df), source_col)
    t = j.agg(F.min(F.col("available") / F.col("weight")).alias("T"))
    return j.crossJoin(F.broadcast(t)).select(
        source_col,
        F.col("available").cast("long").alias("available"),
        "weight",
        F.least(
            F.lit(1.0), F.col("weight") * F.col("T") / F.col("available")
        ).alias("keep_rate"),
    )


def apply_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Resample `docs` to the target source mixture: broadcast-join the
    mixture_plan and keep rows whose hash key falls under their source's
    keep-rate threshold. Same sha256 key as hash_sample, so the result is
    reproducible across runs, engines and cluster sizes, and composes
    with split_assign/stratified_sample (shared key, prefix stability)."""
    plan = mixture_plan(docs, weights, source_col)
    thresh = _hex_threshold_col(F.col("keep_rate"))
    return (
        docs.join(F.broadcast(plan.select(source_col, "keep_rate")), source_col)
        .where(hash_fraction(F.col(key_col)) < thresh)
        .drop("keep_rate")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents (deterministic
    id order) within each shard and chunk the token stream into fixed
    `seq_len` training sequences; documents may span a boundary. Emits one
    row per (document, sequence) overlap with within-sequence offsets:
    (id, shard, seq_id, tok_start, tok_end) — exactly the index a packed
    dataloader needs.

    Shape: one window cumsum PARTITIONED BY the shard (never a global
    unpartitioned window) + one bounded explode over the few sequences a
    document touches. All integer arithmetic — the DuckDB oracle is exact,
    not tolerance-based. Empty documents are dropped (zero tokens pack to
    nothing)."""
    from .dedup import tokens

    t = docs.select(
        F.col(id_col),
        F.col(shard_col),
        F.size(tokens(F.col(text_col))).alias("n"),
    ).where(F.col("n") > 0)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = t.select(
        id_col,
        shard_col,
        "n",
        (F.sum("n").over(w) - F.col("n")).alias("start"),
        F.sum("n").over(w).alias("end"),
    )
    L = F.lit(seq_len)
    seqs = spans.select(
        id_col,
        shard_col,
        "start",
        "end",
        F.explode(
            F.sequence(F.floor(F.col("start") / L), F.floor((F.col("end") - 1) / L))
        ).alias("seq_id"),
    )
    lo = F.greatest(F.col("start"), F.col("seq_id") * L)
    hi = F.least(F.col("end"), (F.col("seq_id") + 1) * L)
    return seqs.select(
        id_col,
        shard_col,
        F.col("seq_id").cast("long").alias("seq_id"),
        (lo - F.col("seq_id") * L).cast("long").alias("tok_start"),
        (hi - F.col("seq_id") * L).cast("long").alias("tok_end"),
    )


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    size_col: str = "n_bytes",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign rows to `n_shards` output shards with near-equal total size —
    the planning step before a training-data writer emits shard files a
    dataloader can stream round-robin without stragglers.

    Strategy: exact global rank by (size desc, id asc) via
    `ranking.global_rank` (range repartition — NO single-task window), then
    boustrophedon (serpentine) round-robin: rank r -> shard r%S on even
    passes, S-1-r%S on odd passes. Big items spread first, each subsequent
    pass compensates the previous pass's ordering, so shard totals differ
    by at most one item of each pass — the classic sorted-serpentine bound
    (max - min <= largest item), deterministic, one pass, no greedy
    driver-side bin packing.

    -> input columns + (rank, shard). Σ per-shard sizes are asserted
    near-equal in tests; the assignment is a pure function of the data.
    """
    from .ranking import global_rank

    ranked = global_rank(
        df, [F.desc(size_col), F.asc(id_col)], rank_col="rank"
    )
    r0 = F.col("rank") - 1  # 0-based
    pass_idx = F.floor(r0 / F.lit(n_shards))
    pos = F.pmod(r0, F.lit(n_shards))
    return ranked.withColumn(
        "shard",
        F.when(F.pmod(pass_idx, F.lit(2)) == 0, pos)
        .otherwise(F.lit(n_shards - 1) - pos)
        .cast("int"),
    )


def hash_unit(col) -> F.Column:
    """Exact uniform double in (0,1) from sha256(col): (48-bit hex prefix +
    0.5) / 2^48. Every step is exact in binary64 (48 < 53 mantissa bits,
    division by a power of two), so Spark and the DuckDB oracle produce the
    bit-identical double — the primitive under dsir.gumbel_key and
    weighted_sample."""
    v = F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 12), 16, 10).cast(
        "double"
    )
    return (v + F.lit(0.5)) / F.lit(float(1 << 48))


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-Res): each row draws u from sha256(key), gets reservoir
    key -ln(u)/w, and the k SMALLEST keys win — exactly the distribution of
    sequential weighted draws without replacement, but embarrassingly
    parallel and reproducible (the draw is a pure function of the data, so
    retries/engines/cluster sizes agree; same design as hash_sample).

    Non-positive weights are excluded (zero weight = never sampled; E-S is
    undefined there). -ln(u) is rounded 9dp (libm discipline), the division
    by w is one IEEE op on identical doubles, and the emitted key is rounded
    9dp. orderBy().limit(k) compiles to TakeOrderedAndProject — distributed
    per-partition heaps, no global sort."""
    u = hash_unit(F.col(key_col))
    es = F.round(F.round(-F.log(u), 9) / F.col(weight_col).cast("double"), 9)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("es_key", es)
        .orderBy(F.asc("es_key"), F.col(key_col))
        .limit(k)
    )


def pack_best_fit(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    shard_col: str = "shard",
) -> DataFrame:
    """Bin-packing sequence packing (best-fit-decreasing) — the
    no-truncation alternative to ``pack_sequences``: documents are never
    split; each lands whole in one training sequence (bin), the layout SFT
    /instruction-tuning pipelines want. -> (shard, bin_id, doc_id, tokens).

    Per shard (deterministic): docs sorted (tokens DESC, id ASC); each doc
    goes to the FULLEST open bin that still fits (ties -> lowest bin id),
    else opens a new bin. A doc longer than max_tokens gets a bin of its
    own (truncation is the trainer's policy, not the packer's). Greedy
    packing is inherently sequential, so it runs per shard in one
    applyInPandas batch — shard sizes are the caller's lever (compose with
    balanced_shards); shards pack in parallel and the per-shard work is
    O(n·bins).

    Falsifiable quality invariant (checked by the sound oracle): any
    fit-first greedy leaves AT MOST ONE bin at <= max_tokens/2 fill per
    shard — a second half-empty bin's first doc would have fit in the
    first. Validity: per-bin fill <= max_tokens unless the bin holds one
    oversize doc; every doc appears exactly once."""
    import pandas as pd

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([tokens_col, id_col], ascending=[False, True])
        fills: list[int] = []
        assign = []
        for t in pdf[tokens_col].astype(int):
            best = -1
            for i, f in enumerate(fills):
                if f + t <= max_tokens and (best < 0 or f > fills[best]):
                    best = i
            if best < 0:
                best = len(fills)
                fills.append(0)
            fills[best] += t
            assign.append(best)
        out = pdf[[shard_col, id_col, tokens_col]].copy()
        out.insert(1, "bin_id", assign)
        return out

    t = docs.select(shard_col, id_col, F.col(tokens_col).cast("long").alias(tokens_col))
    schema = f"{shard_col} long, bin_id int, {id_col} long, {tokens_col} long"
    return t.groupBy(shard_col).applyInPandas(pack, schema)
