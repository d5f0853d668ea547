"""Explicit skew handling: the replicate-salted equi-join as a reusable op.

A Zipf-hot join key (one host owning 10% of a 10^10-row frontier, one
viral image_id fetched by millions of pages) lands every matching row in
ONE shuffle task — the straggler that defines job latency. AQE's skew-join
split (on in session.py) is the automatic backstop, but it only splits
partitions it can observe at runtime and cannot split a single key's hash
bucket across executors for the build side. For PLANNED hot keys the
explicit form is strictly better: replicate the dimension side S-fold and
scatter the fact side's hot rows across the S replicas.

``salted_join`` generalizes the two hand-rolled instances already in the
engine (operators/extract.py::extract_pages' image-stats fan-out and
operators/dedup.py::semdedup_select's hot-list pair join) with the same
discipline: salt ONLY the fan-out join, never accounting keys, and keep
join multiplicity exact (each fact row carries exactly one salt, so it
meets exactly one replica of every matching dim row).

Result is provably identical to the plain join for ``inner`` and ``left``
(the entry oracle hash-checks it against DuckDB's plain join); ``right``/
``full`` are rejected — an unmatched dim row would surface once per
replica.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    dist_col: str,
    n_salt: int = 8,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim ON fact[on] == dim[on]`` with hot keys spread
    over ``n_salt`` tasks.

    - ``dist_col``: a fact column whose xxhash64 distributes that key's
      rows (the frontier uses ``seq``; any high-cardinality column works).
      Deterministic across task retries — never use a nondeterministic id.
    - ``hot_keys``: keys to salt. None salts every key (dim inflated
      S-fold — fine for small dims); a list restricts replication and
      scattering to the listed keys, so the dim grows by only
      ``len(hot_keys) × (n_salt - 1)`` rows.
    - join multiplicity, schema, and row content match the plain join
      exactly; only the shuffle layout changes.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: an unmatched "
            "dim row under right/full would appear once per replica"
        )
    if n_salt <= 1:
        return fact.join(dim, on, how)

    def _is_hot(col: Column) -> Column:
        if hot_keys is None:
            return F.lit(True)
        return col.isin(hot_keys)

    salts = F.array(*[F.lit(i) for i in range(n_salt)])
    dim_s = dim.withColumn(
        "__salt",
        F.explode(F.when(_is_hot(F.col(on)), salts).otherwise(F.array(F.lit(0)))),
    )
    fact_s = fact.withColumn(
        "__salt",
        F.when(
            _is_hot(F.col(on)),
            F.pmod(F.xxhash64(F.col(dist_col)), F.lit(n_salt)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return fact_s.join(dim_s, [on, "__salt"], how).drop("__salt")
