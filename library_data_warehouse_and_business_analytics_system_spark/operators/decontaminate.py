"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The reference warehouse has no decontamination surface (it is an
Oracle star schema — SURVEY.md §2); this is extension surface for the
LLM-training-data pipeline family, same bucket as the dedup operators
in :mod:`.dedup`.

Scale shape (the thing that must survive 100 TB):
- each side is reduced to DISTINCT ``(doc_id, gram_hash)`` pairs
  before the join — the shuffle moves 16-byte rows, never text;
- the match is a plain equi-join on the 8-byte xxhash64 of the gram,
  so Catalyst is free to broadcast the (typically tiny) held-out side
  or fall back to a shuffled hash join — never an all-pairs product;
- the final per-train-doc rollup is a two-phase hash aggregate on
  ``doc_id``.

Hashing caveat: matching on xxhash64 means a hash collision would
mark a clean document as contaminated (false positive, never a false
negative for an actually-shared gram).  With 64-bit hashes the
collision expectation stays ~0 until ~10^9 distinct grams per join
key-space; acceptable for a contamination *filter*, which errs on the
side of dropping training data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int,
               out_id: str) -> DataFrame:
    """Distinct (doc, gram_hash) pairs; the token array is materialized
    behind a projection boundary first (interpreted HOF lambdas re-run
    inlined subtrees per element — see shingles_from_tokens). NULL
    texts are dropped explicitly: without the filter they'd flow
    through as a single NULL shingle whose xxhash64 is the seed hash,
    silently "matching" every other NULL document."""
    toks = (df.where(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias(out_id),
                    TX.tokens(F.lower(F.col(text_col))).alias("_toks")))
    return (
        toks.select(out_id,
                    F.explode(TX.shingle_hashes_from_tokens(F.col("_toks"), n))
                    .alias("gram_hash"))
    )


def ngram_contamination(train: DataFrame, test: DataFrame, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 5) -> DataFrame:
    """Per contaminated training doc: how many distinct word ``n``-grams
    it shares with the held-out set, and how many held-out docs it
    touches.

    Returns ``(train_doc_id, n_shared_grams, n_test_docs)`` — only
    docs with at least one shared gram, ordered by id.  Short-doc
    semantics follow :func:`TX.shingles_from_tokens`: a document with
    fewer than ``n`` tokens contributes its whole token sequence as a
    single gram (so even tiny eval snippets participate).
    """
    tr = _doc_grams(train, id_col, text_col, n, "train_doc_id")
    te = _doc_grams(test, id_col, text_col, n, "test_doc_id").withColumnRenamed(
        "gram_hash", "gram_hash_t")
    joined = tr.join(te, tr.gram_hash == te.gram_hash_t, "inner")
    return (
        joined.groupBy("train_doc_id")
        .agg(F.countDistinct("gram_hash").alias("n_shared_grams"),
             F.countDistinct("test_doc_id").alias("n_test_docs"))
        .orderBy("train_doc_id")
    )
