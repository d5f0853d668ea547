"""salted_join: result must be EXACTLY the plain join (multiplicity
included); the salt must actually scatter the hot key; illegal join types
rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_crawler_spark.operators.skew import salted_join


def _tables(spark):
    # hot key 7: 400 fact rows; cold keys 0..6: 10 rows each. dim has two
    # rows for key 7 (multiplicity matters) and one for the others + one
    # dim-only key 99 (left-join miss side) and fact-only key 42.
    fact = spark.range(0, 470).select(
        F.when(F.col("id") < 400, F.lit(7))
        .otherwise(F.pmod(F.col("id"), F.lit(7)))
        .cast("long")
        .alias("k"),
        F.col("id").alias("seq"),
    ).union(
        spark.range(1000, 1005).select(
            F.lit(42).cast("long").alias("k"), F.col("id").alias("seq")
        )
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)] + [(7, "d7b"), (99, "d99")],
        "k long, v string",
    )
    return fact, dim


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("hot_keys", [None, [7]])
def test_salted_join_equals_plain_join(spark, how, hot_keys):
    fact, dim = _tables(spark)
    plain = fact.join(dim, "k", how)
    salted = salted_join(
        fact, dim, on="k", dist_col="seq", n_salt=8, how=how, hot_keys=hot_keys
    )
    assert salted.columns == plain.columns
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_hot_key_scatters_and_cold_keys_do_not_inflate(spark):
    fact, dim = _tables(spark)
    # reproduce the fact-side salt assignment: the hot key's 400 rows must
    # land on >1 (in practice all 8) salts, i.e. >1 shuffle task at scale
    salts = (
        fact.filter(F.col("k") == 7)
        .select(F.pmod(F.xxhash64("seq"), F.lit(8)).cast("int").alias("s"))
        .distinct()
        .count()
    )
    assert salts > 1
    # with hot_keys=[7], the replicated dim grows by exactly
    # (#dim rows at key 7) * (n_salt - 1)
    dim_s = dim.withColumn(
        "__salt",
        F.explode(
            F.when(
                F.col("k").isin([7]),
                F.array(*[F.lit(i) for i in range(8)]),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    assert dim_s.count() == dim.count() + 2 * 7


def test_salted_join_rejects_right_and_full(spark):
    fact, dim = _tables(spark)
    for how in ("right", "full"):
        with pytest.raises(ValueError):
            salted_join(fact, dim, on="k", dist_col="seq", how=how)


def test_n_salt_one_is_plain_join(spark):
    fact, dim = _tables(spark)
    out = salted_join(fact, dim, on="k", dist_col="seq", n_salt=1)
    assert _sorted_rows(out) == _sorted_rows(fact.join(dim, "k", "inner"))
