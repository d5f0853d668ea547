"""Table profiling — the data-quality pass a 100 TB ingest runs first.

One row per profiled column: row count, null count, exact distinct count,
min/max (computed on the NATIVE type, then rendered as strings so mixed
column types share one schema), and the top-k most frequent values with
counts. This is the summary a pipeline owner reads before trusting a new
crawl dump, and the regression signal between snapshots (join two profiles
on `column`).

Plan shape, deliberately two-pass:

1. scalar stats: ONE aggregate over the table computing every column's
   count/distinct/min/max in a single pass (partial aggregation map-side;
   the result is one row, reshaped to per-column rows with an inline
   explode — no extra action, no driver loop over columns).
2. top-k values: unpivot (cast to string) -> groupBy(column, value) ->
   per-column window top-k -> csv. One shuffle carrying len(cols) x rows
   pairs, cut hard by map-side partial aggregation (value frequencies
   combine before the exchange).

Exact count_distinct is the oracle-checkable default; at extreme scale pass
approx=True to swap in approx_count_distinct (HLL++, same single-agg shape,
no second job) — the sketches module documents the error contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str], top_k: int = 3, approx: bool = False
) -> DataFrame:
    """-> (column, n_rows, n_null, n_distinct, min_val, max_val, top_values)
    with top_values a deterministic 'value:count' csv ordered by count DESC
    then value ASC."""
    distinct_of = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct_of(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    meta = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_val"),
                        F.col(f"__max_{c}").alias("max_val"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.*")

    unpivoted = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols]
    ).unpivot([], cols, "column", "value")
    counts = (
        unpivoted.where(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("column").orderBy(F.desc("cnt"), F.asc("value"))
    top = (
        counts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= top_k)
        .groupBy("column")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct((-F.col("cnt")).alias("neg"), F.col("value"))
                        )
                    ),
                    lambda s: F.concat_ws(
                        ":", s["value"], (-s["neg"]).cast("string")
                    ),
                ),
                ",",
            ).alias("top_values")
        )
    )
    return meta.join(top, "column", "left").na.fill({"top_values": ""})


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric column
    — the drift metric ML-ops gates retraining on (PSI < 0.1 stable,
    > 0.25 action). Fixed-width bins over [lo, hi) with clamp-to-edge
    under/overflow, add-one smoothing so empty bins stay finite:

        psi_term_i = (q_i - p_i) * ln(q_i / p_i),
        p_i = (old_i + 1)/(n_old + B),  q_i = (new_i + 1)/(n_new + B)

    -> one row per bin (bin, p, q, psi_term, rounded 9dp); sum(psi_term)
    is the headline PSI. Two groupBy counts + a B-row domain join — the
    domain comes from spark.range(n_bins) so empty bins exist on both
    sides; everything else is exact-count arithmetic the DuckDB oracle
    replays identically. Scale: two scans, two tiny aggs, zero windows."""
    width = (hi - lo) / n_bins

    def binned(df):
        b = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )
        return df.select(b.alias("bin")).groupBy("bin").agg(F.count(F.lit(1)).alias("c"))

    co, cn = binned(old), binned(new)
    domain = old.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    no = old.count()
    nn = new.count()
    joined = (
        domain.join(co, "bin", "left")
        .withColumnRenamed("c", "c_old")
        .join(cn, "bin", "left")
        .withColumnRenamed("c", "c_new")
        .na.fill({"c_old": 0, "c_new": 0})
    )
    p = (F.col("c_old") + F.lit(1.0)) / F.lit(float(no + n_bins))
    q = (F.col("c_new") + F.lit(1.0)) / F.lit(float(nn + n_bins))
    return joined.select(
        "bin",
        F.round(p, 9).alias("p"),
        F.round(q, 9).alias("q"),
        F.round((q - p) * F.log(q / p), 9).alias("psi_term"),
    )
