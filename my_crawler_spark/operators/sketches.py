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
