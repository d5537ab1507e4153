"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata — SURVEY.md extension spec).

The container has no image/audio libraries, so the DECODE step is
stubbed (clearly marked, gated behind an import-try with a
deterministic fake) — but every Spark-side piece is real and tested:
binary column handling, metadata schema, mapInPandas batch shape,
partitioning. Swapping the fake for PIL/librosa is a one-function
change.

At 100 TB: binary payloads stay columnar in parquet; decode runs as
Arrow-batched mapInPandas with spark.sql.files.maxPartitionBytes tuned
so a batch of payloads fits executor memory; metadata-only queries
never touch the payload column (column pruning).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.session import load_table

DECODED_SCHEMA = (
    "doc_id long, byte_len int, format string, width int, height int, "
    "n_frames int, decoder string"
)


def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata over an opaque binary column: byte length + content
    digest, computed JVM-side. (documents.text cast to binary stands in
    for an image/audio payload column.)"""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.length(payload).alias("byte_len"),
        F.md5(payload).alias("content_md5"),
        F.substring(F.base64(payload), 1, 16).alias("b64_prefix"),
    )


def _decode_batch(batch_iter):
    """mapInPandas worker: decode opaque payloads into typed metadata.

    REAL DECODE IS STUBBED: no imaging libraries in this container.
    The import-try below is the integration point; the deterministic
    fake derives plausible dimensions from the content digest so the
    pipeline shape (schema, batching, partition behavior) is fully
    exercised and reproducible.
    """
    import pandas as pd

    try:  # pragma: no cover - library absent in this environment
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    for pdf in batch_iter:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if have_pil:
                # Integration point for a real decoder:
                # img = PIL.Image.open(io.BytesIO(payload)); ...
                raise NotImplementedError(
                    "real image decode not wired; container lacks test images"
                )
            digest = hashlib.md5(payload).digest()
            rows.append(
                {
                    "doc_id": doc_id,
                    "byte_len": len(payload),
                    "format": ("png", "jpeg", "webp")[digest[0] % 3],
                    "width": 64 + digest[1] % 192,
                    "height": 64 + digest[2] % 192,
                    "n_frames": 1 + digest[3] % 4,
                    "decoder": "stub-md5",
                }
            )
        yield pd.DataFrame(rows)


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pipeline over binary payloads via
    mapInPandas (Arrow-batched). Deterministic fake decoder — see
    _decode_batch. Rows-only check (decoder is engine-specific)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return payloads.mapInPandas(_decode_batch, DECODED_SCHEMA)


def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage DOWNSTREAM of decode: fit each decoded image into a
    224×224 box preserving aspect ratio.

    The decode step is the stub, but the point stands at scale: once
    payloads are decoded to typed metadata, downstream stages are plain
    columnar expressions (JVM codegen, no Python) — only the decode
    itself pays the Arrow-batch round trip. Rows-only check (inherits
    the stub decoder)."""
    decoded = multimodal_decode_stub(spark, sf_dir)
    scale = F.least(F.lit(224.0) / F.col("width"), F.lit(224.0) / F.col("height"))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("out_width"),
        F.round(F.col("height") * scale).cast("int").alias("out_height"),
        F.round(scale, 6).alias("scale"),
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage for video-like payloads: every 2nd frame of
    each decoded clip, one output row per sampled frame (posexplode
    over a frame-index sequence — the row-expansion shape of real frame
    extraction, with per-frame ids derived deterministically).
    Rows-only check (inherits the stub decoder)."""
    decoded = multimodal_decode_stub(spark, sf_dir)
    return decoded.select(
        "doc_id",
        "n_frames",
        F.posexplode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(2))).alias(
            "sample_idx", "frame_idx"
        ),
    ).select(
        "doc_id",
        "n_frames",
        "sample_idx",
        "frame_idx",
        F.md5(F.concat_ws(":", F.col("doc_id"), F.col("frame_idx"))).alias("frame_key"),
    )


QUERIES = {
    "multimodal_binary_meta": multimodal_binary_meta,
    "multimodal_decode_stub": multimodal_decode_stub,
    "multimodal_resize_plan": multimodal_resize_plan,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLE = {
    "multimodal_binary_meta": """
        SELECT doc_id,
               octet_length(text::BLOB) AS byte_len,
               md5(text) AS content_md5,
               substring(to_base64(text::BLOB), 1, 16) AS b64_prefix
        FROM documents
    """,
}
