"""Fetch-extract for the image+caption payload (E1-E10, S10).

One Arrow-batched mapInPandas stage per crawl round:
decode ``bytes`` by sniffing (png / fake-lossy), verify the stored
``phash`` against the decoded pixels (per-row invariant,
BASELINE.json input_hint), pair the ``caption`` and run the reference's
extraction pipeline on it (title/description/greedy chunker — semantics in
functions/text.py, constants index.rs:11-13), emitting a chunks
array-of-struct per page which the runner posexplodes into the chunks sink
(chunk_index <- posexplode ordinal, qdrant.rs:118).

No per-row Python UDFs: decode+extract batch over Arrow record batches;
the embedding (S10 stand-in: hash-seeded gaussian, unit-normalized —
replaces the TEI e5 HTTP call, qdrant.rs:143-159) is a scalar pandas_udf.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import codecs
from ..functions.text import extract_caption_page

EMBED_DIM = 384  # e5-small dimension (qdrant.rs:50, compose.yml:17-18)

CHUNK_STRUCT = StructType(
    [
        StructField("chunk_content", StringType()),
        StructField("chunk_heading", StringType()),
        StructField("chunk_index", LongType()),
        StructField("page_title", StringType()),
        StructField("description", StringType()),
        StructField("source_url", StringType()),
        StructField("page_version", StringType()),
        StructField("point_id", StringType()),
    ]
)


def extract_schema(carry: StructType) -> StructType:
    return StructType(
        list(carry.fields)
        + [
            StructField("decode_ok", BooleanType()),
            StructField("phash_ok", BooleanType()),
            StructField("phash_got", LongType()),
            StructField("page_title", StringType()),
            StructField("description", StringType()),
            StructField("chunks", ArrayType(CHUNK_STRUCT)),
        ]
    )


def image_decode_stats(images: DataFrame) -> DataFrame:
    """Decode each DISTINCT image ONCE -> (image_id, caption, decode_ok,
    phash_ok, phash_got).

    The images table is keyed by image_id while fetches reference it
    many-to-one (the same payload appears on many pages), so decoding on
    the fetch side would repeat identical work fan-out times — with the
    real JPEG codec that repetition dominated the crawl's extract phase.
    Decoding the dim once and joining verdicts is the scale-correct shape
    (at 100 TB this dim would be written once as a stats table, like the
    robots dim). Column pruning keeps the scan at
    (image_id, bytes, caption, phash) — verified in test_explain_plans.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, caps, oks, phoks, phgots = [], [], [], [], []
            for rec in pdf.itertuples(index=False):
                decode_ok, phash_ok, phash_got = False, False, None
                data = rec.bytes
                if data is not None:
                    try:
                        px = codecs.decode_image(bytes(data))
                        phash_got = codecs.phash64(px)
                        decode_ok = True
                        phash_ok = (
                            rec.phash is not None and int(rec.phash) == phash_got
                        )
                    except Exception:
                        pass
                ids.append(rec.image_id)
                caps.append(rec.caption)
                oks.append(decode_ok)
                phoks.append(phash_ok)
                phgots.append(phash_got)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "caption": caps,
                    "decode_ok": oks,
                    "phash_ok": phoks,
                    "phash_got": pd.array(phgots, dtype="Int64"),
                }
            )

    return images.select("image_id", "bytes", "caption", "phash").mapInPandas(
        run,
        "image_id string, caption string, decode_ok boolean, "
        "phash_ok boolean, phash_got long",
    )


def extract_pages(
    fetched: DataFrame,
    images: DataFrame,
    skew_salt: int | None = None,
    image_stats: DataFrame | None = None,
) -> DataFrame:
    """fetched(request_id, seq, final_url, image_id, ...) ⋈ decoded-image
    stats -> one row per page with decode/phash verdicts and the packed
    chunks array.

    The image decode runs ONCE per distinct image (``image_decode_stats``;
    pass a cached ``image_stats`` to reuse it across rounds); only the
    per-fetch caption/url page extract runs per row here.

    Skew (north_rule): a hot image_id (a page fetched by many frontier rows)
    skews the shuffle. ``skew_salt=S`` applies the explicit salted
    replicate-join — the stats side is replicated S-fold with a salt
    column, the fetched side salts by ``xxhash64(seq) % S`` — spreading one
    hot key over S tasks. AQE's skew-join split (enabled in session.py) is
    the automatic backstop; the explicit form is for planned hot keys.
    Salting happens ONLY in this fan-out stage, never in token accounting
    (politeness counts stay per unsalted host).
    """
    img = image_stats if image_stats is not None else image_decode_stats(images)
    if skew_salt and skew_salt > 1:
        img = img.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(skew_salt)]))
        )
        fetched = fetched.withColumn(
            "__salt", F.pmod(F.xxhash64("seq"), F.lit(skew_salt)).cast("int")
        )
        joined = fetched.join(img, ["image_id", "__salt"], "left").drop("__salt")
    else:
        joined = fetched.join(img, "image_id", "left")
    stat_cols = ("caption", "decode_ok", "phash_ok", "phash_got")
    carry_cols = [
        f.name for f in joined.schema.fields if f.name not in stat_cols
    ]
    out_schema = extract_schema(joined.select(*carry_cols).schema)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                d = rec._asdict()
                caption = d.pop("caption") or ""
                if not isinstance(caption, str):  # left-join miss -> NaN
                    caption = ""
                phash_got = d.pop("phash_got")
                dec_ok, ph_ok = d.pop("decode_ok"), d.pop("phash_ok")
                page = extract_caption_page(d.get("final_url") or "", caption)
                rows.append(
                    {
                        **{k: d.get(k) for k in carry_cols},
                        "decode_ok": bool(dec_ok) if pd.notna(dec_ok) else False,
                        "phash_ok": bool(ph_ok) if pd.notna(ph_ok) else False,
                        "phash_got": (
                            int(phash_got) if pd.notna(phash_got) else None
                        ),
                        "page_title": page["title"],
                        "description": page["description"],
                        "chunks": page["chunks"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return joined.mapInPandas(run, out_schema)


@F.pandas_udf(ArrayType(FloatType()))
def deterministic_embedding(text: pd.Series) -> pd.Series:
    """S10 stand-in for the TEI e5 encoder: shake_256-expanded,
    unit-normalized EMBED_DIM vector. Deterministic (same text -> same
    vector) so the resume tests stay exact.

    This is the chunk sink's hot loop (2.4M rows/round at the bench
    scale), so it is minimized, measured at 40k rows/batch:
    - ONE shake_256 squeeze of EMBED_DIM bytes per row (0.18 s) replaces
      the 13-digest sha256 chain (0.43 s) — XOF output length is exactly
      the vector size, no chain, no slicing;
    - the per-row loop only hashes into one joined buffer; subtract and
      normalize run once per BATCH. The uint8 cast rides the subtract
      ufunc (`dtype=float32`, 22 ms) — a plain `.astype(float32)` from
      uint8 takes 700+ ms for the same batch on this numpy build (scalar
      cast loop), and it was being paid PER ROW before (~10 us/row);
    - row norms via einsum (7 ms) instead of np.linalg.norm (25 ms).
    Net: ~0.8 s -> ~0.24 s per 40k batch (3.4x) in the Arrow stage."""
    texts = text.fillna("")
    if not len(texts):
        return pd.Series([], dtype=object)
    buf = b"".join(
        hashlib.shake_256(t.encode()).digest(EMBED_DIM) for t in texts
    )
    u8 = np.frombuffer(buf, dtype=np.uint8).reshape(len(texts), EMBED_DIM)
    arr = np.subtract(u8, np.float32(127.5), dtype=np.float32)
    norms = np.sqrt(np.einsum("ij,ij->i", arr, arr))[:, None]
    np.divide(arr, norms, out=arr, where=norms != 0.0)
    return pd.Series(list(arr))


def explode_chunks(pages: DataFrame) -> DataFrame:
    """pages-with-chunks -> one row per chunk + embedding (sink shape)."""
    c = pages.select(
        "request_id", F.explode("chunks").alias("c")
    ).select("request_id", "c.*")
    text = F.concat_ws(
        "\n",
        F.concat(F.lit("passage: "), F.col("page_title")),
        F.coalesce(F.col("chunk_heading"), F.lit("")),
        F.col("chunk_content"),
    )
    return c.withColumn("embedding", deterministic_embedding(text))
