"""Registry entries for the multimodal operators.

The documents table doubles as the media corpus (utf-8 payload bytes +
synthesized typed metadata — operators/multimodal.documents_as_media),
so the mapInPandas decode plumbing is differential-tested end-to-end:
the deterministic fake decode is pure md5 arithmetic, which the DuckDB
oracle reproduces with substr/hex-cast over md5(text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..sources.catalog import load_table
from .registry import register


@register(
    "media_decode_stats",
    """
    SELECT doc_id AS media_id,
           16 + CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) % 497
             AS width,
           16 + CAST('0x' || substr(md5(text), 5, 4) AS INTEGER) % 497
             AS height,
           1 + CAST('0x' || substr(md5(text), 9, 1) AS INTEGER) % 3
             AS n_channels,
           CAST('0x' || substr(md5(text), 10, 4) AS INTEGER) / 65535.0
             AS mean_pixel
    FROM documents
    ORDER BY media_id
    """,
    operators=("MEDIA-DECODE", "UDF-MAPINPANDAS"),
    bench=True,
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.documents_as_media(docs)
    return MM.decode_images(media).orderBy("media_id")


@register(
    "media_frame_counts",
    """
    SELECT doc_id AS media_id,
           (n_chars * 10) // 1000 + 1 AS n_frames,
           CAST((n_chars * 10) // 1000 * 1000 AS BIGINT) AS last_frame_ts_ms
    FROM documents
    WHERE doc_id % 3 = 0
    ORDER BY media_id
    """,
    operators=("MEDIA-FRAMESAMPLE", "S9", "A1"),
)
def media_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.documents_as_media(docs)
    return (
        MM.sample_frames(media, every_ms=1000)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"),
             F.max("frame_ts_ms").alias("last_frame_ts_ms"))
        .orderBy("media_id")
    )


@register(
    "media_audio_stats",
    """
    WITH h AS (SELECT doc_id, md5(text) AS x FROM documents)
    SELECT doc_id AS media_id,
           CAST(CASE CAST('0x' || substr(x, 1, 1) AS INTEGER) % 4
                  WHEN 0 THEN 8000 WHEN 1 THEN 16000
                  WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER)
             AS sample_rate,
           CAST(1 + CAST('0x' || substr(x, 2, 1) AS INTEGER) % 2 AS INTEGER)
             AS n_channels,
           CAST(CASE CAST('0x' || substr(x, 3, 1) AS INTEGER) % 3
                  WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 32 END AS INTEGER)
             AS bit_depth,
           CAST(1000 + CAST('0x' || substr(x, 4, 5) AS BIGINT) % 100000
                AS BIGINT) AS n_frames,
           CAST(((1000 + CAST('0x' || substr(x, 4, 5) AS BIGINT) % 100000)
                 * 1000)
                // (CASE CAST('0x' || substr(x, 1, 1) AS INTEGER) % 4
                      WHEN 0 THEN 8000 WHEN 1 THEN 16000
                      WHEN 2 THEN 22050 ELSE 44100 END)
                AS BIGINT) AS duration_ms,
           CAST('0x' || substr(x, 9, 4) AS INTEGER) / 65535.0 AS rms
    FROM h
    ORDER BY media_id
    """,
    operators=("MEDIA-AUDIO", "UDF-MAPINPANDAS"),
)
def media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-tier audio decode over the same document-backed media
    corpus — puts the decode_audio mapInPandas plumbing (schema, Arrow
    batching, column contract) under the driver's oracle gate exactly
    as media_decode_stats does for images; the real WAV tier is
    known-signal tested in tests/test_multimodal.py."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.documents_as_media(docs)
    return MM.decode_audio(media).orderBy("media_id")


@register(
    "media_video_stats",
    """
    WITH h AS (SELECT doc_id, md5(text) AS x FROM documents
               WHERE doc_id % 3 = 0)
    SELECT doc_id AS media_id,
           CAST(16 + CAST('0x' || substr(x, 1, 4) AS INTEGER) % 497
                AS INTEGER) AS width,
           CAST(16 + CAST('0x' || substr(x, 5, 4) AS INTEGER) % 497
                AS INTEGER) AS height,
           CAST(1 + CAST('0x' || substr(x, 9, 4) AS INTEGER) % 300
                AS BIGINT) AS n_frames,
           CAST(CASE CAST('0x' || substr(x, 13, 1) AS INTEGER) % 4
                  WHEN 0 THEN 10 WHEN 1 THEN 24
                  WHEN 2 THEN 25 ELSE 30 END AS DOUBLE) AS fps,
           CAST((1 + CAST('0x' || substr(x, 9, 4) AS INTEGER) % 300) * 1000
                // (CASE CAST('0x' || substr(x, 13, 1) AS INTEGER) % 4
                      WHEN 0 THEN 10 WHEN 1 THEN 24
                      WHEN 2 THEN 25 ELSE 30 END)
                AS BIGINT) AS duration_ms,
           CAST('0x' || substr(x, 14, 4) AS INTEGER) / 65535.0 AS mean_luma
    FROM h
    ORDER BY media_id
    """,
    operators=("MEDIA-VIDEO", "UDF-MAPINPANDAS"),
)
def media_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-tier video decode over the document-backed media corpus
    (kind='video' rows only, exercising the metadata pre-filter) —
    gates the decode_video mapInPandas plumbing exactly as
    media_decode_stats / media_audio_stats do for images and audio;
    the real Y4M tier is known-signal tested in
    tests/test_multimodal.py."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.documents_as_media(docs)
    return (MM.decode_video(media.filter(F.col("meta.kind") == "video"))
            .orderBy("media_id"))
