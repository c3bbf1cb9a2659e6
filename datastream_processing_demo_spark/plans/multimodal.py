"""Multimodal-column queries (SURVEY.md §2.2 LLM-ext multimodal row).

DuckDB's blob surface is narrower than Spark's (no md5(BLOB), no
substring(BLOB)), so oracles compute the same values from the text/
lengths — the equality is on VALUES, proving Spark's binary plumbing
produces the right answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    FRAME_BYTES,
    extract_features,
    frames_col,
    sample_frames,
    to_binary_payload,
)
from ._util import t
from .registry import query


@query(
    "mm_binary_metadata", "multimodal",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           substring(lower(hex(encode(text))), 1, 8) AS magic_hex
    FROM documents
    """,
    description="binary payload column + typed metadata struct",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = to_binary_payload(t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
        F.col("meta.magic_hex").alias("magic_hex"),
    )


@query(
    "mm_decode_features", "multimodal",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) % 640 AS width,
           (octet_length(encode(text)) * 7) % 480 AS height,
           CAST(3 AS BIGINT) AS channels,
           CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte
    FROM documents
    """,
    description="mapInPandas decode stage (deterministic fake codec)",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(to_binary_payload(t(spark, sf_dir, "documents")))


@query(
    "mm_frame_sample", "multimodal",
    oracle=f"""
    SELECT doc_id,
           CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
           CAST(ceil(ceil(length(text) / {FRAME_BYTES}.0) / 3.0) AS BIGINT)
               AS n_sampled,
           substring(text, 1, {FRAME_BYTES}) AS first_frame_text
    FROM documents
    """,
    description="payload chunking into frames + every-3rd frame sampling",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    frames = frames_col("text", FRAME_BYTES)
    sampled = sample_frames(frames, every=3)
    return d.select(
        "doc_id",
        F.size(frames).cast("long").alias("n_frames"),
        F.size(sampled).cast("long").alias("n_sampled"),
        F.decode(F.element_at(sampled, 1), "UTF-8").alias("first_frame_text"),
    )
