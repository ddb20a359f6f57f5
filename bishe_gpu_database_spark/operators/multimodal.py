"""Multimodal columns: opaque binary payloads with typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic stub — but the Spark-side plumbing is real:
binary columns, typed metadata structs, Arrow-batched ``mapInPandas``
with an explicit output schema, and partition-sized batches. Swap
``_fake_decode`` for PIL/ffmpeg on a real cluster and nothing else
changes.

``multimodal_binary_meta`` is oracle-checked (byte-level metadata is pure
SQL); ``multimodal_decode_features`` runs the actual mapInPandas path and
is *also* oracle-checked because the stub's arithmetic is reproduced in
ANSI SQL — the strongest available check for a Python-UDF operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.relational import t
from bishe_gpu_database_spark.registry import register


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(octet_length(CAST(text AS BLOB)) % 640 AS INT) AS shard
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata. The payload column is real
    ``binary`` (utf-8 bytes of the text standing in for image bytes);
    metadata (size, checksum, shard) is computed JVM-side."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5("text").alias("payload_md5"),
        (F.octet_length(payload) % 640).cast("int").alias("shard"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB for the real decoder (PIL/ffmpeg not in this container).

    Deterministic fake: 'width'/'height' from byte length, 'mean_px' from
    a byte sum — keeps the pipeline testable end-to-end. A real deploy
    replaces this body with e.g. ``PIL.Image.open(io.BytesIO(payload))``.
    """
    n = len(payload)
    width = n % 640 + 1
    height = n % 480 + 1
    mean_px = float(sum(payload[:64])) / min(n, 64) if n else 0.0
    return width, height, round(mean_px, 6)


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INT) AS width,
           CAST(octet_length(CAST(text AS BLOB)) % 480 + 1 AS INT) AS height,
           round(CAST(list_sum(list_transform(generate_series(1, least(octet_length(CAST(text AS BLOB)), 64)),
                 i -> ord(substr(text, i, 1)))) AS DOUBLE)
                 / least(octet_length(CAST(text AS BLOB)), 64), 6) AS mean_px
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract via Arrow-batched ``mapInPandas`` — the real
    multimodal hot path: binary in, typed features out, batch-at-a-time.
    (Oracle reproduces the stub's arithmetic; valid because document text
    here is ASCII, so byte values == code points.)"""
    d = t(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": feats.map(lambda f: f[0]).astype("int32"),
                    "height": feats.map(lambda f: f[1]).astype("int32"),
                    "mean_px": feats.map(lambda f: f[2]),
                }
            )

    return with_payload.mapInPandas(
        decode_batches, schema="doc_id bigint, width int, height int, mean_px double"
    )
