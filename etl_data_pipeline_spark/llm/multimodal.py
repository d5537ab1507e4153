"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata — SURVEY.md extension spec).

Two decode paths:

1. ``multimodal_decode_header`` — a REAL byte-level parse of a tiny
   self-describing container format (SMF1): magic + format char +
   fixed-width header fields, parsed JVM-side with substring/cast
   (whole-stage codegen, no Python). The payloads are synthesized
   deterministically from the documents table (the testdata ships no
   binary media column), and the DuckDB oracle re-runs BOTH the pack
   and the parse — so decode and its downstream stages (resize plan,
   frame sampling) are hash-checked end-to-end.
2. ``multimodal_decode_stub`` — the Arrow-batched mapInPandas shape a
   real image decoder (PIL/librosa) plugs into; the container has no
   imaging libraries, so the decode stops at the container header,
   parsed vectorized in pandas with the SAME semantics as path 1
   (invalid magic -> NULL fields). This keeps the Python batch
   plumbing (schema, batching, partition behavior) exercised AND
   hash-checked against the same DuckDB oracle as the JVM parse.

At 100 TB: binary payloads stay columnar in parquet; header-only
analytics read 15 bytes per row JVM-side (path 1); full decodes run as
Arrow-batched mapInPandas (path 2) with
spark.sql.files.maxPartitionBytes tuned so a batch of payloads fits
executor memory; metadata-only queries never touch the payload column
(column pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround
from etl_data_pipeline_spark.session import load_table

DECODED_SCHEMA = (
    "doc_id long, byte_len int, format string, width int, height int, "
    "n_frames int, decoder string"
)

# SMF1 ("synthetic media format"): 'SMF1' + format char (p/j/w) +
# width (4 ASCII digits) + height (4) + n_frames (2) + body bytes.
SMF_MAGIC = "SMF1"
SMF_HEADER_LEN = 4 + 1 + 4 + 4 + 2  # = 15 bytes


def _hexbyte(hexcol: Column, i: int) -> Column:
    """i-th byte (1-based) of a hex digest string, as int — portable
    (Spark conv(hex,16,10) ≡ DuckDB ('0x'||..)::INT)."""
    return F.conv(F.substring(hexcol, 2 * i - 1, 2), 16, 10).cast("int")


def _packed_payloads(docs: DataFrame) -> DataFrame:
    """Synthesize (doc_id, payload binary) in SMF1: header fields are
    md5-derived (deterministic, same derivation as the stub decoder),
    body is the document text bytes. Pure JVM expressions."""
    d = F.md5(F.col("text"))
    width = 64 + _hexbyte(d, 2) % 192
    height = 64 + _hexbyte(d, 3) % 192
    n_frames = 1 + _hexbyte(d, 4) % 4
    fmt_char = F.element_at(
        F.array(F.lit("p"), F.lit("j"), F.lit("w")), _hexbyte(d, 1) % 3 + 1
    )
    header = F.concat(
        F.lit(SMF_MAGIC),
        fmt_char,
        F.lpad(width.cast("string"), 4, "0"),
        F.lpad(height.cast("string"), 4, "0"),
        F.lpad(n_frames.cast("string"), 2, "0"),
    )
    return docs.select(
        "doc_id", F.concat(header, F.col("text")).cast("binary").alias("payload")
    )


def multimodal_decode_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level header decode of SMF1 payloads: validate the magic,
    parse format/width/height/n_frames from fixed offsets — all inside
    whole-stage codegen (substring + cast on the payload bytes), no
    Python anywhere. Invalid-magic rows surface as NULL fields rather
    than errors (bad bytes are data, not exceptions, at 100 TB).

    This is the production shape for header-only media analytics: the
    scan reads 15 bytes per row of the payload column and never pays a
    Python/Arrow round trip; only a FULL decode (pixels/samples) needs
    the mapInPandas path (multimodal_decode_stub).
    """
    p = _packed_payloads(load_table(spark, sf_dir, "documents"))
    s = F.col("payload").cast("string")
    valid = F.substring(s, 1, 4) == SMF_MAGIC
    fmt_char = F.substring(s, 5, 1)
    return p.select(
        "doc_id",
        F.length("payload").alias("byte_len"),
        F.when(valid & (fmt_char == "p"), "png")
        .when(valid & (fmt_char == "j"), "jpeg")
        .when(valid & (fmt_char == "w"), "webp")
        .alias("format"),
        F.when(valid, F.substring(s, 6, 4).cast("int")).alias("width"),
        F.when(valid, F.substring(s, 10, 4).cast("int")).alias("height"),
        F.when(valid, F.substring(s, 14, 2).cast("int")).alias("n_frames"),
        F.lit("smf1").alias("decoder"),
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
    """mapInPandas worker: decode SMF1 payloads into typed metadata.

    A real pixel/sample decoder (PIL / librosa / av) plugs in right
    after the header parse — `payload[SMF_HEADER_LEN:]` is the media
    body. The container ships no imaging libraries, so decode stops at
    the header: parsed VECTORIZED in pandas (no per-row Python), with
    the same semantics as the JVM path (invalid magic -> NULL fields,
    never exceptions — bad bytes are data, not errors, at 100 TB).
    """
    import pandas as pd

    for pdf in batch_iter:
        payload = pdf["payload"]
        hdr = payload.str[:SMF_HEADER_LEN].str.decode("ascii", errors="replace")
        valid = hdr.str[:4] == SMF_MAGIC
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payload.str.len().astype("int32"),
                "format": hdr.str[4].map({"p": "png", "j": "jpeg", "w": "webp"}).where(
                    valid
                ),
                "width": pd.to_numeric(hdr.str[5:9], errors="coerce").where(valid),
                "height": pd.to_numeric(hdr.str[9:13], errors="coerce").where(valid),
                "n_frames": pd.to_numeric(hdr.str[13:15], errors="coerce").where(valid),
                "decoder": "arrow-python",
            }
        )


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pipeline over binary payloads via mapInPandas
    (Arrow-batched) — the slot a real image/audio decoder occupies.
    Header fields are parsed in Python (see _decode_batch) and
    hash-checked against the same DuckDB oracle as the JVM parse, so
    the Arrow plumbing itself is correctness-gated."""
    payloads = _packed_payloads(load_table(spark, sf_dir, "documents"))
    return payloads.mapInPandas(_decode_batch, DECODED_SCHEMA)


def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage DOWNSTREAM of decode: fit each decoded image into a
    224×224 box preserving aspect ratio.

    Consumes the byte-parsed header decode, so the whole lineage is
    JVM-side and oracle-checked. Once payloads are decoded to typed
    metadata, downstream stages are plain columnar expressions —
    only a FULL pixel decode pays the Arrow-batch round trip. Output
    dims use floor(x+0.5) (identical IEEE expression cross-engine)
    rather than round() (half-even vs half-away varies by engine)."""
    decoded = multimodal_decode_header(spark, sf_dir)
    scale = F.least(F.lit(224.0) / F.col("width"), F.lit(224.0) / F.col("height"))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") * scale + 0.5).cast("int").alias("out_width"),
        F.floor(F.col("height") * scale + 0.5).cast("int").alias("out_height"),
        hround(scale, 6).alias("scale"),
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage for video-like payloads: every 2nd frame of
    each decoded clip, one output row per sampled frame (posexplode
    over a frame-index sequence — the row-expansion shape of real frame
    extraction, with per-frame ids derived deterministically).
    Consumes the byte-parsed header decode — oracle-checked."""
    decoded = multimodal_decode_header(spark, sf_dir)
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
    "multimodal_decode_header": multimodal_decode_header,
    "multimodal_resize_plan": multimodal_resize_plan,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_binary_meta": multimodal_binary_meta,
    "multimodal_decode_stub": multimodal_decode_stub,
}

# DuckDB rerun of the SMF1 pack + header parse (same md5-derived
# fields, same fixed offsets) — CTE ending in decoded(...).
_SMF_DECODE_CTE = f"""f AS (
            SELECT doc_id, text,
                   ('0x' || substr(md5(text), 1, 2))::INT % 3 AS fmt_code,
                   64 + ('0x' || substr(md5(text), 3, 2))::INT % 192 AS w,
                   64 + ('0x' || substr(md5(text), 5, 2))::INT % 192 AS h,
                   1 + ('0x' || substr(md5(text), 7, 2))::INT % 4 AS nf
            FROM documents
        ), packed AS (
            SELECT doc_id,
                   '{SMF_MAGIC}'
                   || (CASE fmt_code WHEN 0 THEN 'p' WHEN 1 THEN 'j' ELSE 'w' END)
                   || lpad(w::VARCHAR, 4, '0') || lpad(h::VARCHAR, 4, '0')
                   || lpad(nf::VARCHAR, 2, '0') || text AS payload
            FROM f
        ), decoded AS (
            SELECT doc_id,
                   octet_length(payload::BLOB) AS byte_len,
                   CASE WHEN substr(payload, 1, 4) = '{SMF_MAGIC}' THEN
                       CASE substr(payload, 5, 1)
                            WHEN 'p' THEN 'png' WHEN 'j' THEN 'jpeg'
                            WHEN 'w' THEN 'webp' END
                   END AS format,
                   CASE WHEN substr(payload, 1, 4) = '{SMF_MAGIC}'
                        THEN substr(payload, 6, 4)::INT END AS width,
                   CASE WHEN substr(payload, 1, 4) = '{SMF_MAGIC}'
                        THEN substr(payload, 10, 4)::INT END AS height,
                   CASE WHEN substr(payload, 1, 4) = '{SMF_MAGIC}'
                        THEN substr(payload, 14, 2)::INT END AS n_frames,
                   'smf1' AS decoder
            FROM packed
        )"""

ORACLE = {
    "multimodal_binary_meta": """
        SELECT doc_id,
               octet_length(text::BLOB) AS byte_len,
               md5(text) AS content_md5,
               substring(to_base64(text::BLOB), 1, 16) AS b64_prefix
        FROM documents
    """,
    "multimodal_decode_header": f"""
        WITH {_SMF_DECODE_CTE}
        SELECT doc_id, byte_len, format, width, height, n_frames, decoder
        FROM decoded
    """,
    "multimodal_resize_plan": f"""
        WITH {_SMF_DECODE_CTE}
        SELECT doc_id, width, height,
               CAST(floor(width * least(224.0 / width, 224.0 / height) + 0.5)
                    AS INTEGER) AS out_width,
               CAST(floor(height * least(224.0 / width, 224.0 / height) + 0.5)
                    AS INTEGER) AS out_height,
               floor(least(224.0 / width, 224.0 / height) * 1000000 + 0.5)
                   / 1000000 AS scale
        FROM decoded
    """,
    "multimodal_frame_sample": f"""
        WITH {_SMF_DECODE_CTE}
        SELECT doc_id, n_frames,
               frame_idx // 2 AS sample_idx,
               frame_idx,
               md5(doc_id::VARCHAR || ':' || frame_idx::VARCHAR) AS frame_key
        FROM (SELECT doc_id, n_frames,
                     unnest(range(0, n_frames, 2)) AS frame_idx
              FROM decoded)
    """,
    "multimodal_decode_stub": f"""
        WITH {_SMF_DECODE_CTE}
        SELECT doc_id, byte_len, format, width, height, n_frames,
               'arrow-python' AS decoder
        FROM decoded
    """,
}
