"""Multimodal column plumbing (BASELINE.json north-star): image/audio/
video payloads as opaque ``binary`` columns with typed metadata,
decode/feature-extract as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode step is a
clearly-marked stub (`decode_image` raises NotImplementedError; the
pipeline runs a deterministic fake decoder instead) — but the
Spark-side plumbing that matters at 100 TB is real and tested: binary
schema, per-batch Arrow transfer, frame-sampling fan-out, and
partition-preserving metadata extraction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pro_etl_spark.io import load
from pro_etl_spark.ops.text import DUCK_HASH60, hash60
from pro_etl_spark.registry import register


def decode_image(payload: bytes) -> "object":
    """Real decode requires an image codec (PIL/opencv), absent in this
    container. The pipeline below substitutes a deterministic fake."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode_meta for the deterministic stand-in"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derive a fake (width, height)
    from the payload length."""
    n = len(payload)
    return (320 + n % 320, 240 + n % 240)


def binary_manifest(docs: DataFrame) -> DataFrame:
    """Model a multimodal corpus: payload = utf-8 bytes of the text
    column (an opaque blob as far as the engine cares) + typed
    metadata columns."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


@register(
    "mm_manifest",
    oracle=f"""
    SELECT doc_id,
           'application/octet-stream' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           {DUCK_HASH60.format(x="text")} % 1000 AS content_bucket
    FROM documents
    """,
)
def mm_manifest(spark: SparkSession, d: str) -> DataFrame:
    """Binary-column manifest: payload sizes + a content-hash bucket
    (the partition key a 100 TB media lake would colocate on)."""
    m = binary_manifest(load(spark, d, "documents"))
    return m.select(
        "doc_id",
        "mime",
        "n_bytes",
        (hash60(F.decode("payload", "UTF-8")) % 1000).alias("content_bucket"),
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, CAST(octet_length(encode(text)) AS BIGINT), 100))
                AS BIGINT) AS frame_offset
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, d: str) -> DataFrame:
    """Frame sampling fan-out: one row per sampled frame offset (every
    100th byte) — the explode pattern a video pipeline uses to turn
    one blob row into N frame rows without driver involvement."""
    m = binary_manifest(load(spark, d, "documents"))
    # empty payloads yield no frames (sequence(0,-1) would throw); the
    # when-guard mirrors the oracle's empty range(0,0)
    offsets = F.when(
        F.col("n_bytes") > 0,
        F.sequence(F.lit(0).cast("long"), F.col("n_bytes") - 1, F.lit(100).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    return m.select("doc_id", F.explode(offsets).alias("frame_offset"))


@register("mm_decode_features")  # rows-only: exercises Arrow binary batches
def mm_decode_features(spark: SparkSession, d: str) -> DataFrame:
    """Decode/feature-extract stage: mapInPandas over Arrow record
    batches of binary payloads → (doc_id, width, height, mean_byte).
    The decode itself is the deterministic fake (real codec stubbed,
    see decode_image); the batch shape, binary transfer, and schema are
    production-real."""
    m = binary_manifest(load(spark, d, "documents"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": meta.map(lambda m: m[0]).astype("int64"),
                    "height": meta.map(lambda m: m[1]).astype("int64"),
                    "mean_byte": pdf["payload"].map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                }
            )

    return m.mapInPandas(
        extract, "doc_id long, width long, height long, mean_byte double"
    )
