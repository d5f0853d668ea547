"""Structured Streaming face of the crawl engine (SURVEY.md §2.6).

The reference is a continuously-running queue consumer
(spider/src/crawl_loop.rs:75-95): an unbounded stream of CrawlRequests with
per-key in-flight state (robots TTL cache, per-origin politeness tokens).
The batch BSP runner (plans/crawl_plan.py) is the primary engine; this
module is the streaming ingress + stateful-politeness layer on top:

- ``admit_request_stream``  : readStream of crawl-request JSON lines ->
  normalize (F1) + trap-reject (F4) -> admitted seeds stream
  (add_crawl_request semantics, crawl_loop.rs:61-69)
- ``politeness_token_stream``: applyInPandasWithState keyed by host — a
  token-bucket per host (1 token / ``interval_s``, burst 1 — the
  governor quota, web_visitor.rs:49-53); each micro-batch admits what the
  bucket allows and defers the rest into state
- ``metrics_window_stream``  : watermarked tumbling-window counts by
  outcome over the visit log (R11 as a live dashboard feed)

Late data note: a re-discovered URL arriving late is dropped by the
seen-filter regardless of arrival time, so no special late-data semantics
are needed beyond the watermark (SURVEY §2.6).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.url import canonicalize_url, is_crawl_trap, url_host

REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("max_pages", T.IntegerType()),
        T.StructField("max_depth", T.IntegerType()),
        T.StructField("same_domain", T.BooleanType()),
        T.StructField("enqueued_at", T.TimestampType()),
    ]
)


def admit_request_stream(spark: SparkSession, requests_dir: str) -> DataFrame:
    """File-source stream of JSON crawl requests -> admitted seed stream."""
    raw = spark.readStream.schema(REQUEST_SCHEMA).json(requests_dir)
    canon = raw.withColumn("seed", canonicalize_url(F.col("url")))
    return (
        canon.filter(F.col("seed").isNotNull())
        .filter(~is_crawl_trap(F.col("seed")))
        .select(
            "request_id",
            F.col("seed").alias("url"),
            url_host(F.col("seed")).alias("host"),
            "max_pages",
            "max_depth",
            "same_domain",
            "enqueued_at",
        )
    )


ADMIT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("batch_admitted", T.IntegerType()),
        T.StructField("deferred_in_state", T.IntegerType()),
    ]
)
ADMIT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("pending", T.ArrayType(T.StringType())),
    ]
)


def politeness_token_stream(
    urls: DataFrame, interval_s: float = 2.0, burst: int = 1
) -> DataFrame:
    """Per-host token bucket as streaming state (Q6, web_visitor.rs:29-62).

    Input stream: (host, url, event_ts:double — seconds). Per micro-batch
    and host: refill tokens at 1/interval_s up to ``burst``, admit that many
    pending+new URLs FIFO, keep the rest in state. Emits admitted rows with
    bucket telemetry.
    """

    def admit(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (host,) = key
        if state.exists:
            tokens, last_ts, pending = state.get
            pending = list(pending)
        else:
            tokens, last_ts, pending = float(burst), 0.0, []
        new_urls: list[str] = []
        now = last_ts
        for pdf in pdfs:
            if len(pdf):
                new_urls.extend(pdf.sort_values("event_ts")["url"].tolist())
                now = max(now, float(pdf["event_ts"].max()))
        tokens = min(float(burst), tokens + max(now - last_ts, 0.0) / interval_s)
        queue = pending + new_urls
        n_admit = min(len(queue), int(tokens))
        admitted, rest = queue[:n_admit], queue[n_admit:]
        tokens -= n_admit
        state.update((tokens, now, rest))
        state.setTimeoutDuration(60_000)
        if admitted:
            yield pd.DataFrame(
                {
                    "host": host,
                    "url": admitted,
                    "batch_admitted": len(admitted),
                    "deferred_in_state": len(rest),
                }
            )

    return urls.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType=ADMIT_OUT_SCHEMA,
        stateStructType=ADMIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def fetch_extract_stream(
    admitted: DataFrame,
    pages: DataFrame,
    redirects: DataFrame,
    images: DataFrame,
    chunks_table,
    rendered: DataFrame | None = None,
    image_stats: DataFrame | None = None,
    max_hops: int = 0,
):
    """Streamed S1+E1 vertical: micro-batches of admitted frontier rows
    (request_id, seq, url, depth[, use_browser]) run the SAME fetch-as-join
    + Arrow decode/phash/chunk operators as the batch BSP round, then
    upsert chunks (S8+S9 semantics, qdrant.rs:130-139).

    ``foreachBatch`` rather than stream-static joins: the pages dim join
    alone would stream, but the bounded iterative redirect resolution and
    the decode-once image-stats dim need a concrete batch per trigger.
    Exactly-once effect on the sink: the upsert keys on (source_url,
    page_version) and drops stale versions, so replaying a micro-batch
    after a failure converges to the same table state (idempotent).

    Returns a DataStreamWriter — caller picks trigger and checkpoint, e.g.
    ``.trigger(availableNow=True).option("checkpointLocation", ...)``.
    """
    from ..operators.extract import explode_chunks, extract_pages
    from ..operators.fetch import fetch_join
    from ..plans.crawl_plan import CHUNKS_SCHEMA
    from ..sources.lake import upsert_chunks_with_stale_delete

    has_redirects = not redirects.isEmpty()

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        fetched = fetch_join(
            batch_df, pages, redirects, has_redirects=has_redirects,
            rendered=rendered, max_hops=max_hops,
        )
        extracted = extract_pages(
            fetched.filter(F.col("fetch_kind") == "ok").select(
                "request_id", "seq", "final_url", "image_id"
            ),
            images,
            image_stats=image_stats,
        ).select("request_id", "seq", "chunks")
        chunks = explode_chunks(extracted).select(
            *[f.name for f in CHUNKS_SCHEMA]
        )
        upsert_chunks_with_stale_delete(chunks_table, chunks)

    return admitted.writeStream.foreachBatch(_process)


def metrics_window_stream(
    visits: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Live crawl metrics: tumbling-window outcome counts (R11)."""
    return (
        visits.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("outcome"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "outcome", "n")
    )


def curation_stream(
    docs_stream: DataFrame,
    curated_table,
    seen_table,
    min_quality: float = 0.4,
    langs: tuple[str, ...] = ("en", "de", "fr", "es", "zh"),
):
    """Streamed corpus curation — the incremental-ingest form of the batch
    `corpus_curation` pipeline: each micro-batch of (doc_id, text) rows
    runs the SAME quality/language gates, exact-dedups within the batch
    (min doc_id per text hash) AND against every previously accepted doc
    (anti-join on the seen-hash table), then appends survivors.

    Exactly-once effect on the sink: the seen anti-join makes re-delivered
    docs no-ops, so replaying a micro-batch after a failure converges to
    the same curated table (same idempotence contract as
    fetch_extract_stream). `seen_table` rows are (text_hash) only — the
    state is O(accepted docs), the corpus itself never re-reads.

    foreachBatch rather than stream-static joins: the seen dim must be
    re-read per trigger (it grows with every batch), and dropDuplicates
    on an unbounded stream would hold state forever; the snapshot-table
    anti-join IS the watermark-free dedup state, shared with any batch
    writer. Returns a DataStreamWriter.
    """
    from ..operators.dedup import normalized_text
    from ..operators.textstats import lang_id_expr, quality_score_expr

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        gated = (
            batch_df.withColumn("quality", quality_score_expr(F.col("text")))
            .withColumn("lang", lang_id_expr(F.col("text")))
            .filter(
                (F.col("quality") >= F.lit(float(min_quality)))
                & F.col("lang").isin(*langs)
            )
            .withColumn("text_hash", F.md5(normalized_text(F.col("text"))))
        )
        from pyspark.sql import Window as W

        first = (
            gated.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("text_hash").orderBy("doc_id")
                ),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        fresh = first.join(seen_table.read(), "text_hash", "left_anti")
        # cache: two commits consume `fresh`; without it the gates run twice
        fresh = fresh.cache()
        try:
            curated_table.commit(
                fresh.select("doc_id", "text", "lang", "quality"), mode="append"
            )
            seen_table.commit(fresh.select("text_hash"), mode="append")
        finally:
            fresh.unpersist()

    return docs_stream.writeStream.foreachBatch(_process)


def image_pair_stream(
    images_stream: DataFrame,
    curated_table,
    seen_table,
    min_caption_chars: int = 5,
):
    """Streamed image+caption ingest — the image-axis twin of
    `curation_stream`: each micro-batch of (image_id, bytes, caption) rows
    runs the batch pipeline's decode gate (one Arrow pass -> decode_ok, w,
    h, phash), a caption gate (non-empty, >= min_caption_chars), exact
    within-batch phash dedup (min image_id per phash), then the cross-batch
    anti-join on the seen-phash snapshot table before appending survivors
    as (image_id, phash, w, h, caption).

    Exactly-once effect: re-delivered micro-batches anti-join to nothing,
    so replay converges to the same curated table (the `curation_stream`
    idempotence contract). The streaming form trades the batch pipeline's
    transitive Hamming clustering for exact-phash dedup — near-dup
    consolidation stays a periodic BATCH compaction over the curated
    table (`curate_images`), which is how an incremental ingest + nightly
    dedup actually splits at scale; state here is O(accepted phashes).
    """
    from ..operators.multimodal import decode_stats

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        gated = (
            decode_stats(batch_df.select("image_id", "bytes"))
            .filter(F.col("decode_ok") & (F.col("w") > 0) & (F.col("h") > 0))
            .join(batch_df.select("image_id", "caption"), "image_id")
            .filter(
                F.length(F.trim(F.col("caption"))) >= F.lit(int(min_caption_chars))
            )
        )
        from pyspark.sql import Window as W

        first = (
            gated.withColumn(
                "rn",
                F.row_number().over(W.partitionBy("phash").orderBy("image_id")),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        fresh = first.join(seen_table.read(), "phash", "left_anti").cache()
        try:
            curated_table.commit(
                fresh.select(
                    "image_id",
                    "phash",
                    F.col("w").cast("long").alias("w"),
                    F.col("h").cast("long").alias("h"),
                    "caption",
                ),
                mode="append",
            )
            seen_table.commit(fresh.select("phash"), mode="append")
        finally:
            fresh.unpersist()

    return images_stream.writeStream.foreachBatch(_process)
