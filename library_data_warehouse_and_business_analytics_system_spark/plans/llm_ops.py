"""LLM-training-data pipeline operators over ``documents`` /
``embeddings`` / ``events`` (extension surface, BASELINE.json
north-star). Oracle-matched where DuckDB can express the same
semantics; approximate/sketch operators are verified in pytest against
their exact counterparts instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Exact deduplication: keep the first doc_id per identical text.
# Scale note: groupBy on a text-hash, not on the raw text — the shuffle
# key is 16 bytes instead of document bytes; at 100 TB that is the
# difference between shuffling hashes and shuffling the corpus.


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    ORDER BY keep_doc_id
    """,
    operators=("DEDUP-EXACT", "A1"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("text_hash", F.md5("text"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_doc_id")
    )


# ---------------------------------------------------------------------------
# Token counting + quality scoring over documents (text-analysis ops).
# Whitespace tokenization expressed identically in both engines.


@register(
    "doc_token_stats",
    r"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    operators=("TEXT-TOKENS", "A1"),
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens).cast("bigint").alias("total_tokens"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("source")
    )
