"""Content-defined chunking (CDC) and chunk-level deduplication.

Fixed-k window dedup (operators/substring.py) breaks when one token
is inserted — every window downstream shifts. Content-defined
boundaries don't: a chunk ends wherever a token's hash lands in a
chosen residue class (FastCDC/rsync's insight applied at token
level), so an edit only reperimeters the chunk it touches and
chunk-level dedup stays stable under local edits — the property
storage dedup and incremental-sync systems are built on.

Engine mapping: boundary flags are a pure hash expression; chunk ids
are a per-document running count (window partitioned BY DOCUMENT —
bounded by document length, never corpus-wide); chunk text reassembles
with an ordered fold; cross-doc duplication is a two-phase count on
the 16-byte chunk hash. The duplicated-chunk table grows with the
corpus (Heaps posture) → its membership join SHUFFLES, no broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def content_chunks(docs: DataFrame, avg_len: int = 8,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_tokens): token-level CDC.

    A token CLOSES its chunk when ``md5_bucket(token) % avg_len == 0``
    — expected chunk length ``avg_len``, boundaries decided only by
    local content. The running boundary count runs in a PER-DOCUMENT
    window ordered by position (partition size = document length, so
    the sort is trivially cheap and embarrassingly parallel across
    docs at any corpus size)."""
    toks = TX.tokens(F.lower(F.col(text_col)))
    tok_pos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "tok"))
    is_boundary = (TX.md5_bucket(F.col("tok"), avg_len, salt="cdc")
                   == 0).cast("int")
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, -1))
    chunked = tok_pos.withColumn(
        "chunk_id",
        F.coalesce(F.sum(is_boundary).over(w), F.lit(0)).cast("int"))
    return (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(
                    F.struct("pos", "tok"))), lambda s: s["tok"]),
                " ").alias("chunk_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    )


def chunk_dedup_stats(docs: DataFrame, avg_len: int = 8,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Per-document chunk-duplication telemetry: of a doc's chunks,
    how many (and what token share) also appear VERBATIM in another
    document. Returns (doc_id, n_chunks, dup_chunks, dup_token_frac).

    Two-phase: distinct (doc, chunk-hash) → chunk-hashes in ≥2 docs →
    shuffled membership join back (16-byte key). A doc whose every
    chunk recurs elsewhere is a reassembled-from-known-parts document
    — the near-dup class window-hashing misses once edits shift
    alignments."""
    chunks = content_chunks(docs, avg_len, id_col, text_col)
    hashed = chunks.select(
        "doc_id", "n_tokens", F.md5("chunk_text").alias("ch"))
    shared = (hashed.select("doc_id", "ch").distinct()
              .groupBy("ch").agg(F.count(F.lit(1)).alias("ndocs"))
              .filter(F.col("ndocs") > 1)
              .select("ch", F.lit(True).alias("is_dup")))
    return (
        hashed.join(shared, "ch", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.coalesce("is_dup", F.lit(False)).cast("int"))
            .cast("bigint").alias("dup_chunks"),
            (F.sum(F.when(F.col("is_dup"), F.col("n_tokens"))
                   .otherwise(0)).cast("double")
             / F.sum("n_tokens").cast("double")).alias("dup_token_frac"))
    )
