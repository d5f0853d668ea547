"""Per-host politeness admission (Q6) + robots gate (S4) for a crawl round.

Reference semantics being re-expressed:
- politeness: 1 request / 2 s / origin, 1 in-flight / origin
  (spider/src/web_visitor.rs:29-62). In BSP terms a round of duration D
  grants each host ``tokens_per_round ~= D / 2s`` fetch slots.
- ordering: the reference frontier is strict FIFO *within a request*
  (crawl_loop.rs:115-143); politeness delays but never reorders. The BSP
  equivalent is **strict-prefix admission**: a round admits the longest
  seq-prefix of the frontier in which no host exceeds its token budget.
  Because every round is a contiguous prefix of the reference's visit
  order, round boundaries cannot change any gate decision — politeness is
  pure pacing, and the final visit order / seen set are independent of
  token budgets (property-tested in tests/test_frontier.py).

Token ranking is a native window cumsum (pure JVM — the admission stage
scans the whole frontier, the biggest table in the system); only robots
matching runs in ``groupBy(origin).applyInPandas`` batches (body parsed
once per group, matched vectorized over the group's URLs).

Skew note (north_rule): admission only *ranks* per host — the heavy
fetch/decode stage afterwards is free to salt a hot host's admitted rows
across partitions (`salt = seq % S`); the token ledger itself must never
be salted or counts would split. At 10^10 frontier rows the groupBy here
shuffles only (request_id, seq, host, url-hash) control columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.robots import origin_allowed, select_group_rules

DEFAULT_TOKENS_PER_ROUND = 8
PRODUCT_TOKEN = "my_crawler"


def _with_budget(frontier: DataFrame, budgets: DataFrame) -> DataFrame:
    if "token_cost" not in frontier.columns:
        frontier = frontier.withColumn("token_cost", F.lit(1).cast("long"))
    return frontier.join(
        F.broadcast(
            budgets.withColumn("tokens_per_round", F.col("tokens_per_round").cast("long"))
        ),
        "host",
        "left",
    ).withColumn(
        # a zero/negative budget would starve the strict prefix forever
        "tokens_per_round",
        F.greatest(
            F.coalesce("tokens_per_round", F.lit(DEFAULT_TOKENS_PER_ROUND).cast("long")),
            F.lit(1).cast("long"),
        ),
    )


def _admitted_from_ranked(ranked: DataFrame) -> DataFrame:
    # over-budget = the row would start after the budget is exhausted; a
    # host's first fetchable row always starts (its own cost may overflow
    # the round — the fetch just takes longer, like the reference's retries)
    over = ranked.filter(
        F.col("fetchable")
        & (F.col("host_rank") - F.col("token_cost") >= F.col("tokens_per_round"))
    )
    cutoffs = over.groupBy("request_id").agg(F.min("seq").alias("cutoff_seq"))
    return (
        ranked.join(F.broadcast(cutoffs), "request_id", "left")
        .withColumn(
            "admitted", F.col("cutoff_seq").isNull() | (F.col("seq") < F.col("cutoff_seq"))
        )
        .drop("cutoff_seq", "tokens_per_round", "host_rank")
    )


def admit_prefix(frontier: DataFrame, budgets: DataFrame) -> DataFrame:
    """Mark each frontier row admitted/deferred for this round.

    frontier: (request_id, url, host, depth, seq, fetchable:boolean
               [, token_cost:long — per-attempt politeness cost, S2])
    budgets:  (host, tokens_per_round) — small dim, broadcast.

    Returns frontier + ``admitted`` column. Strict prefix per request_id:
    cutoff = min seq (per request) of any fetchable row that would START
    after its host's token budget is spent (``cumulative_cost - own_cost >=
    budget``); admitted = seq < cutoff. With unit costs this is exactly the
    old "rank exceeds budget" rule; weighted costs (retried fetches, S2)
    only move the cutoff earlier — pacing, never reordering.

    The cumulative cost is a native window ``sum(token_cost * fetchable)
    OVER (PARTITION BY request_id, host ORDER BY seq)`` — whole-stage
    codegen, spillable, no Arrow round trip — this runs on the FULL frontier
    (the 10^10-row table at scale), so a grouped-map pandas stage here would
    both ship the table through Arrow every round and materialize each
    (request, host) group as a single frame (a hot host with 10^7 queued
    URLs = multi-GB in one task). ``admit_prefix_grouped_map`` keeps the
    pandas implementation as a test twin.
    """
    ranked = _with_budget(frontier, budgets).withColumn(
        "host_rank",
        F.sum(
            F.when(F.col("fetchable"), F.col("token_cost")).otherwise(F.lit(0).cast("long"))
        ).over(
            Window.partitionBy("request_id", "host")
            .orderBy("seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return _admitted_from_ranked(ranked)


def admit_prefix_grouped_map(frontier: DataFrame, budgets: DataFrame) -> DataFrame:
    """Grouped-map twin of :func:`admit_prefix` (the round-2 implementation)
    kept for equivalence testing — not on the hot path."""
    with_budget = _with_budget(frontier, budgets)
    rank_schema = StructType(
        with_budget.schema.fields + [StructField("host_rank", LongType())]
    )

    def rank_host(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq").copy()
        pdf["host_rank"] = (pdf["token_cost"] * pdf["fetchable"]).cumsum()
        return pdf

    ranked = with_budget.groupBy("request_id", "host").applyInPandas(rank_host, rank_schema)
    return _admitted_from_ranked(ranked)


def robots_gate(
    rows: DataFrame, robots_dim: DataFrame, salt: int = 8,
    broadcast: bool = True,
) -> DataFrame:
    """Adds ``robots_allowed_flag`` via per-(origin, salt) applyInPandas
    batches.

    rows:       must carry (origin, url) (+ anything else, passed through)
    robots_dim: (origin, entry_body:string nullable, allow_all:boolean) —
                the cache-policy-resolved robots table (robots.rs:100-134).
    broadcast:  at web scale robots is a TABLE (10^8 origins = multi-GB),
                not a dim — pass False above the broadcast threshold and the
                join falls back to a shuffle join on origin (both sides
                hash-partition; the frontier side was about to shuffle by
                origin for the grouped matcher anyway).
    Origins with no robots row behave as 404 allow-all (robots.rs:108-114).

    Matching is per-row independent — only the body parse is per-group — so
    the group key is salted by a url hash: a web of H origins fans out to
    H*salt tasks instead of H (the body is re-parsed salt times per origin,
    which is noise next to shipping it once per group). Pass salt=1 for the
    unsalted layout.
    """
    if salt > 1:
        rows = rows.withColumn("__rsalt", F.pmod(F.xxhash64("url"), F.lit(salt)))
    group_keys = ["origin", "__rsalt"] if salt > 1 else ["origin"]
    out_schema = StructType(rows.schema.fields + [StructField("robots_allowed_flag", BooleanType())])
    row_cols = [f.name for f in rows.schema.fields]

    def check(key, pdf: pd.DataFrame) -> pd.DataFrame:
        body = pdf["__entry_body"].iloc[0]
        allow_all = pdf["__allow_all"].iloc[0]
        if pd.isna(allow_all):  # no robots row -> 4xx allow-all policy
            body, allow_all = None, True
        if body is None or (isinstance(body, float) and pd.isna(body)):
            pdf["robots_allowed_flag"] = bool(allow_all)
            return pdf.drop(columns=["__entry_body", "__allow_all"])
        # parse + compile the group's rules ONCE per origin, then match the
        # whole batch with vectorized pandas .str ops (no per-row Python)
        rules = select_group_rules(body, PRODUCT_TOKEN)
        if rules is None:
            pdf["robots_allowed_flag"] = True
            return pdf.drop(columns=["__entry_body", "__allow_all"])
        paths = pdf["url"].str.replace(
            r"^[a-z][a-z0-9+.\-]*://[^/?]*", "", regex=True, case=False
        )
        # urlsplit (the scalar twin, url_match_path) drops fragments; cut
        # them here too so both matchers agree on URLs containing '#'
        paths = paths.str.split("#", n=1).str[0]
        paths = paths.where(paths.str.startswith("/"), "/" + paths)
        verdict = pd.Series(True, index=pdf.index)
        for _pat, is_allow, rx in rules:  # ascending precedence; last write wins
            verdict[paths.str.match(rx)] = is_allow
        pdf["robots_allowed_flag"] = verdict
        return pdf.drop(columns=["__entry_body", "__allow_all"])

    # Trivial-allow shortcut (guide §4.1 — don't ship rows to Python that a
    # column expression can decide): an origin whose robots body contains no
    # 'disallow' substring AT ALL cannot deny any path (robots defaults to
    # allow; Allow rules only re-allow), and a NULL body resolves straight
    # from allow_all. The verdict for those origins is a per-DIM-row
    # expression; only rows of origins with a potentially-denying body go
    # through the Arrow matcher. On permissive webs this removes the whole
    # frontier-sized Python round trip.
    import os

    # Trivial-allow shortcut: correct (see below) and it removes the
    # frontier-sized Arrow round trip on permissive webs, but the union
    # layout re-evaluates the joined relation per branch per consumer and
    # the interleaved warm A/B measured the net as neutral-to-negative
    # here — ships OFF; enable for webs where the Python matcher dominates.
    if os.environ.get("SPARK_GRAFT_ROBOTS_FAST", "0") != "1":
        # plain single-branch layout (every row through the Arrow matcher)
        dim0 = robots_dim.select(
            "origin",
            F.col("entry_body").alias("__entry_body"),
            F.col("allow_all").alias("__allow_all"),
        )
        if broadcast:
            dim0 = F.broadcast(dim0)
        out = (
            rows.join(dim0, "origin", "left")
            .groupBy(*group_keys)
            .applyInPandas(check, out_schema)
        )
        return out.drop("__rsalt") if salt > 1 else out
    dim = robots_dim.select(
        "origin",
        F.col("entry_body").alias("__entry_body"),
        F.col("allow_all").alias("__allow_all"),
        F.when(
            F.col("entry_body").isNull(),
            F.coalesce(F.col("allow_all"), F.lit(True)),
        )
        .when(
            ~F.lower(F.col("entry_body")).contains("disallow"), F.lit(True)
        )
        .alias("__triv"),
        F.lit(True).alias("__has_dim"),
    )
    if broadcast:
        dim = F.broadcast(dim)
    joined = rows.join(dim, "origin", "left")
    # no dim row = 404 allow-all policy (robots.rs:108-114)
    verdict = F.when(F.col("__has_dim").isNull(), F.lit(True)).otherwise(
        F.col("__triv")
    )
    fast = joined.filter(verdict.isNotNull()).select(
        *row_cols, verdict.alias("robots_allowed_flag")
    )
    slow = joined.filter(
        F.col("__has_dim").isNotNull() & F.col("__triv").isNull()
    ).drop("__triv", "__has_dim")
    out = fast.unionByName(
        slow.groupBy(*group_keys).applyInPandas(check, out_schema)
    )
    return out.drop("__rsalt") if salt > 1 else out


def py_robots_policy_allowed(entry_body: str | None, allow_all: bool, url: str) -> bool:
    """Driver-side one-off check (seed admission) sharing the same matcher."""
    return origin_allowed(entry_body, bool(allow_all), PRODUCT_TOKEN, url)
