"""Sketch-based distinct counting for crawl/corpus metrics.

At 100 TB, "how many distinct URLs per host" / "distinct users per event
type" is a metrics query that must NOT pay an exact distinct: `count(DISTINCT
x)` plans an Expand + full shuffle of every (key, x) pair, while a
HyperLogLog++ sketch (`approx_count_distinct`, relativeSD rsd) is a fixed
few-KB accumulator per group that partial-aggregates map-side and merges —
one narrow shuffle of sketch bytes, error ~rsd regardless of scale. The
reference keeps exact per-crawl counters in memory (a single process can);
a cluster-scale metrics rollup swaps them for sketches.

`approx_distinct` is the production path (sketch only). The soundness twin
`approx_distinct_violations` runs BOTH plans and reports any group whose
sketch estimate strays beyond a conservative 4*rsd band (HLL++ error is
~1 sigma = rsd; 4 sigma plus an absolute slack of 2 for tiny groups never
fires on a correct implementation) — the same empty-violations contract as
the minhash/simhash/ANN sound oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, keys: list[str], value_col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group HLL++ distinct estimate: (keys..., n_approx)."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(value_col, rsd).alias("n_approx")
    )


def approx_distinct_violations(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    rsd: float = 0.05,
    tol_sigmas: float = 4.0,
    abs_slack: int = 2,
) -> DataFrame:
    """Empty-violations check of the sketch against the exact plan.

    -> (violation, group_key, n_exact, n_approx) — empty iff every group's
    estimate lands inside max(tol_sigmas*rsd*exact, abs_slack) AND the
    grouping itself is non-vacuous (a zero-group input can't evidence
    anything, so it IS a violation).
    """
    approx = approx_distinct(df, keys, value_col, rsd)
    exact = df.groupBy(*keys).agg(
        F.countDistinct(value_col).alias("n_exact")
    )
    j = exact.join(approx, keys, "full_outer")
    tol = F.greatest(
        F.lit(tol_sigmas * rsd) * F.col("n_exact").cast("double"),
        F.lit(float(abs_slack)),
    )
    gkey = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    bad = j.where(
        F.col("n_exact").isNull()
        | F.col("n_approx").isNull()
        | (F.abs(F.col("n_approx") - F.col("n_exact")).cast("double") > tol)
    ).select(
        F.lit("estimate_out_of_band").alias("violation"),
        gkey.alias("group_key"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_approx").cast("long").alias("n_approx"),
    )
    vacuous = (
        exact.agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") == 0)
        .select(
            F.lit("vacuous_grouping").alias("violation"),
            F.lit(None).cast("string").alias("group_key"),
            F.lit(None).cast("long").alias("n_exact"),
            F.lit(None).cast("long").alias("n_approx"),
        )
    )
    return bad.unionByName(vacuous)


def approx_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 1000,
) -> DataFrame:
    """Per-group quantile sketch (Greenwald-Khanna via approx_percentile):
    (keys..., prob, q_approx). Like the HLL path, the sketch partial-
    aggregates map-side and merges as a bounded accumulator — no per-group
    sort, no full shuffle of values, rank error <= 1/accuracy."""
    est = df.groupBy(*keys).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("qs")
    )
    pos = F.posexplode(F.col("qs"))
    pr = F.array(*[F.lit(float(p)) for p in probs])
    return est.select(
        *keys, pos.alias("i", "q_approx")
    ).select(
        *keys,
        F.element_at(pr, F.col("i") + 1).alias("prob"),
        F.col("q_approx").cast("double").alias("q_approx"),
    )


def approx_quantile_violations(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 1000,
) -> DataFrame:
    """Empty-violations check: every sketch quantile must land between the
    EXACT interpolated quantiles at prob -/+ 1/accuracy (the sketch's rank
    guarantee, widened by one interpolation step). Vacuous groupings are
    themselves violations, so an empty result is evidence, not absence.
    """
    eps = 1.0 / accuracy
    est = approx_quantiles(df, keys, value_col, probs, accuracy)
    lo_arr = F.array(*[F.lit(max(p - eps, 0.0)) for p in probs])
    hi_arr = F.array(*[F.lit(min(p + eps, 1.0)) for p in probs])
    pr = F.array(*[F.lit(float(p)) for p in probs])
    exact = df.groupBy(*keys).agg(
        F.percentile(F.col(value_col).cast("double"), lo_arr).alias("los"),
        F.percentile(F.col(value_col).cast("double"), hi_arr).alias("his"),
        F.count(F.lit(1)).alias("n"),
    )
    pos = F.posexplode(F.col("qs_zip"))
    bounds = exact.select(
        *keys,
        "n",
        F.arrays_zip(pr.alias("prob"), F.col("los").alias("lo"), F.col("his").alias("hi")).alias(
            "qs_zip"
        ),
    ).select(*keys, "n", pos.alias("i", "z")).select(
        *keys, "n", F.col("z.prob").alias("prob"), F.col("z.lo").alias("lo"), F.col("z.hi").alias("hi")
    )
    j = bounds.join(est, [*keys, "prob"], "full_outer")
    # one interpolation step of slack: exact bounds interpolate between
    # neighbors while the sketch returns a real element of the group
    slack = (F.col("hi") - F.col("lo")) + F.lit(1e-9) + F.abs(F.col("hi")) * F.lit(1e-12)
    gkey = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    bad = j.where(
        F.col("q_approx").isNull()
        | F.col("lo").isNull()
        | (F.col("q_approx") < F.col("lo") - slack)
        | (F.col("q_approx") > F.col("hi") + slack)
    ).select(
        F.lit("quantile_out_of_band").alias("violation"),
        gkey.alias("group_key"),
        F.col("prob"),
        F.col("q_approx"),
        F.col("lo"),
        F.col("hi"),
    )
    vacuous = (
        df.groupBy(*keys)
        .count()
        .agg(F.count(F.lit(1)).alias("g"))
        .where(F.col("g") == 0)
        .select(
            F.lit("vacuous_grouping").alias("violation"),
            F.lit(None).cast("string").alias("group_key"),
            F.lit(None).cast("double").alias("prob"),
            F.lit(None).cast("double").alias("q_approx"),
            F.lit(None).cast("double").alias("lo"),
            F.lit(None).cast("double").alias("hi"),
        )
    )
    return bad.unionByName(vacuous)


# ---------------------------------------------------------------------------
# Count-min sketch: heavy hitters without a full-vocab shuffle-and-sort
# ---------------------------------------------------------------------------

def cms_build(
    term_counts: DataFrame,
    term_col: str = "term",
    count_col: str = "n",
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Count-min sketch over a (term, count) relation -> (d, bucket, n).

    The sketch is depth*width cells no matter the vocab size: each term adds
    its count to one bucket per hash row (bucket = xxhash64(d, term) % width,
    pure codegen). At 100 TB the input is the map-side-combined term-count
    relation, the output is a few-KB table — the only full-size shuffle in
    the pipeline is the one term groupBy the exact path needs anyway.
    """
    rows = term_counts.select(
        F.col(term_col).alias("term"),
        F.col(count_col).cast("long").alias("n"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    )
    return (
        rows.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col("d"), F.col("term")), F.lit(width))
        )
        .groupBy("d", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def cms_estimate(
    terms: DataFrame,
    sketch: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-query the sketch for each term -> (term, est_n).

    est = min over hash rows of the term's bucket count. Never BELOW the
    true count (every occurrence landed in each probed bucket); above it
    only by collision mass. The sketch side is tiny -> broadcast join.
    """
    probes = terms.select(F.col(term_col).alias("term")).distinct().select(
        "term",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    ).withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("d"), F.col("term")), F.lit(width))
    )
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").fillna(
        0, subset=["n"]
    )
    return joined.groupBy("term").agg(F.min("n").alias("est_n"))


def heavy_hitters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: int = 600,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Corpus heavy hitters via CMS prefilter + exact verify
    -> (term, n) with n >= threshold.

    Plan: one tokenize+explode groupBy for exact counts (map-side combined);
    CMS built FROM those counts (no second pass over tokens); candidates =
    est >= threshold (a guaranteed SUPERSET of the true heavy hitters, since
    CMS never underestimates); exact-verify the candidates. The candidate
    set is bounded by depth*width cells' worth of mass, so the final filter
    touches a tiny relation — the pattern that replaces "sort the whole
    vocab by count" at scale.
    """
    from .dedup import tokens

    exact = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sketch = cms_build(exact, depth=depth, width=width)
    cand = cms_estimate(exact, sketch, depth=depth, width=width).filter(
        F.col("est_n") >= threshold
    )
    return (
        exact.join(F.broadcast(cand.select("term")), "term")
        .filter(F.col("n") >= threshold)
        .select("term", "n")
    )


def cms_violations(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Empty-violations soundness check of the CMS against the exact counts:
    any term whose sketch estimate is BELOW its true count breaks the
    count-min guarantee; a zero-term corpus is itself a violation (vacuous
    evidence). -> (violation, term, n_exact, n_est), always empty on a
    correct sketch over a non-empty corpus.
    """
    from .dedup import tokens

    exact = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sketch = cms_build(exact, depth=depth, width=width)
    est = cms_estimate(exact, sketch, depth=depth, width=width)
    bad = (
        exact.join(est, "term")
        .filter(F.col("est_n") < F.col("n"))
        .select(
            F.lit("underestimate").alias("violation"),
            F.col("term"),
            F.col("n").cast("long").alias("n_exact"),
            F.col("est_n").cast("long").alias("n_est"),
        )
    )
    vacuous = (
        exact.agg(F.count(F.lit(1)).alias("g"))
        .where(F.col("g") == 0)
        .select(
            F.lit("vacuous_corpus").alias("violation"),
            F.lit(None).cast("string").alias("term"),
            F.lit(None).cast("long").alias("n_exact"),
            F.lit(None).cast("long").alias("n_est"),
        )
    )
    return bad.unionByName(vacuous)
