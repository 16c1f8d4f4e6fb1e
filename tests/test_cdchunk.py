"""Content-defined chunking semantics (operators/cdchunk.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.cdchunk import (
    chunk_dedup_stats, content_chunks,
)


def test_chunks_reassemble_to_document(spark, sf_dir):
    from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").limit(50)
    chunks = content_chunks(docs, avg_len=8)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list(
                F.struct("chunk_id", "chunk_text"))),
                lambda s: s["chunk_text"]), " ").alias("rebuilt")))
    orig = docs.select(
        "doc_id",
        F.array_join(F.split(F.trim(F.lower("text")), r"\s+"), " ")
        .alias("norm"))
    diff = (orig.join(rebuilt, "doc_id")
            .filter(F.col("norm") != F.col("rebuilt")).count())
    assert diff == 0


def test_boundaries_are_content_local(spark):
    """The CDC property: prepending tokens must not change chunking
    downstream of the first boundary after the edit — identical
    suffixes produce identical chunk multisets past that point."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel " * 6
    a = spark.createDataFrame([(1, base)], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "INSERTED TOKENS " + base)],
                              ["doc_id", "text"])
    ca = {r["chunk_text"] for r in content_chunks(a, 8).collect()}
    cb = {r["chunk_text"] for r in content_chunks(b, 8).collect()}
    # all but the first chunk of each doc must coincide
    assert len(ca & cb) >= len(ca) - 1


def test_dup_stats_flag_shared_chunks_only(spark):
    df = spark.createDataFrame(
        [(1, "shared phrase of many tokens " * 4),
         (2, "shared phrase of many tokens " * 4),
         (3, "completely different content here nine ten eleven")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in chunk_dedup_stats(df, 8).collect()}
    assert rows[1]["dup_token_frac"] == 1.0
    assert rows[2]["dup_token_frac"] == 1.0
    assert rows[3]["dup_chunks"] == 0
    assert rows[3]["dup_token_frac"] == 0.0


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} common run of words here {i}") for i in range(40)],
        ["doc_id", "text"])
    one = sorted(map(tuple, chunk_dedup_stats(
        docs.repartition(1), 8).collect()))
    many = sorted(map(tuple, chunk_dedup_stats(
        docs.repartition(11), 8).collect()))
    assert one == many
