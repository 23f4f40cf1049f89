"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract as Arrow-batched ``mapInPandas`` stages.

North-star extension surface (BASELINE.json).  The container has no
image/audio codecs, so the decode kernel is a clearly-marked deterministic
fake (STUB) — but everything Spark-side is real and load-bearing: the binary
column representation, the metadata struct schema, the ``mapInPandas``
batch-iterator signature, partition-preserving narrow execution, and the
projection contract (binary column dropped after feature extraction so the
heavy bytes never travel further than necessary).

At 100 TB: payload bytes dominate — keep them in their own column so column
pruning skips them for metadata-only queries; decode early, project the
payload away, and carry only extracted features downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_frames int, checksum string"
)


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode kernel (mapInPandas body).

    A real deployment swaps the body for PIL/ffmpeg/soundfile decoding; the
    signature, batch shape, and output schema are the production contract.
    The fake derives deterministic "dimensions" from the payload digest, so
    tests are stable and the oracle-free check is reproducible.
    """
    for pdf in batches:
        digests = [hashlib.sha256(b).digest() if b is not None else b"" for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(b) if b is not None else 0 for b in pdf["payload"]],
                # STUB: real decoder returns actual dims / frame counts
                "width": [(d[0] << 8 | d[1]) % 1920 + 1 for d in digests],
                "height": [(d[2] << 8 | d[3]) % 1080 + 1 for d in digests],
                "n_frames": [d[4] % 32 + 1 for d in digests],
                "checksum": [d.hex()[:16] for d in digests],
            }
        )


def as_media_table(docs: DataFrame) -> DataFrame:
    """Build a media-shaped table from ``documents``: payload = encoded text
    (an opaque blob to the engine), typed metadata alongside — the layout a
    real image/audio table would have."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").cast("bigint").alias("content_length"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


@register(
    "multimodal_metadata_stats",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END          AS media_type,
           count(*)                           AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           round(avg(n_chars), 4)             AS avg_content_length
    FROM documents
    GROUP BY media_type
    """,
    doc="Metadata-only rollup over a multimodal table: payload column is "
    "pruned from the scan (only byte length touches the blob) — the query "
    "shape that must NOT read 100 TB of pixels.",
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load(spark, sf_dir, "documents"))
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.round(F.avg(F.col("meta.content_length")), 4).alias("avg_content_length"),
        )
    )


@register(
    "multimodal_decode_features",
    oracle=None,  # decode kernel is a stub; structural checks in tests/test_multimodal.py
    doc="Decode / feature-extract via mapInPandas (Arrow batches, narrow — "
    "no shuffle): payload → (width, height, n_frames, checksum), payload "
    "projected away afterwards. Decode body is a deterministic STUB standing "
    "in for PIL/ffmpeg (not installed here).",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load(spark, sf_dir, "documents"))
    return media.select("doc_id", "payload", "media_type").mapInPandas(
        fake_decode_batch, schema=DECODED_SCHEMA
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
    FROM documents, LATERAL unnest(range(0, CAST(floor(n_chars / 50) AS BIGINT), 4)) AS t(f)
    WHERE doc_id % 3 = 2
    """,
    doc="Frame sampling for video rows: every 4th frame index from a "
    "metadata-declared frame count (n_frames ~ content_length/50), fanned "
    "out 1→N with explode(sequence(...)) — the decode work-list a video "
    "pipeline feeds to its frame extractor.  The payload is carried by "
    "REFERENCE (doc_id + byte length only) so the blob is never replicated "
    "per frame — the fan-out that must stay metadata-sized at 100 TB.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load(spark, sf_dir, "documents"))
    video = media.filter(F.col("media_type") == "video/mp4")
    n_frames = (F.col("meta.content_length") / 50).cast("long")
    frames = F.sequence(F.lit(0).cast("long"), n_frames - 1, F.lit(4).cast("long"))
    return (
        video.filter(n_frames > 0)
        .select(
            "doc_id",
            F.octet_length("payload").cast("long").alias("payload_bytes"),
            F.explode(frames).alias("frame_no"),
        )
        .select("doc_id", "frame_no", "payload_bytes")
    )
