"""Cross-document boilerplate-line removal — the C4/RefinedWeb-style
curation pass that strips lines repeated across many documents
(navigation chrome, cookie banners, license footers) while keeping
each document's unique content in original order.

Scale shape: the global line-frequency table groups on a 16-byte md5
of the line — the shuffle carries (hash, doc_id) pairs, never line
text — and the per-doc reassembly is a single groupBy whose payload
is the document's own kept lines. Both aggregations are two-phase
(map-side partial). The boilerplate set (lines above the
document-frequency threshold) is NOT broadcast (VERDICT r6): on a
web corpus, cross-site chrome lines appearing in ≥3 documents number
in the hundreds of millions — the set grows with the corpus, so the
anti-join shuffles on the fixed-width 16-byte line_hash instead
(AQE may still pick broadcast at small scale from real stats).

Deterministic end to end (hash + position ordering), hence
oracle-checkable: the driver gate `boilerplate_line_scrub` matches a
DuckDB translation bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_frequencies(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(line_hash, n_docs): per distinct line, in how many distinct
    documents it appears. A line appearing twice in one doc counts
    once — document frequency, the statistic the boilerplate decision
    needs."""
    return (
        docs.select(F.col(id_col),
                    F.explode(F.split(text_col, "\n")).alias("_line"))
        .select(id_col, F.md5("_line").alias("line_hash"))
        .distinct()
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def remove_boilerplate_lines(docs: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             min_docs: int = 3) -> DataFrame:
    """Rebuild every document without the lines that occur in
    ``min_docs`` or more distinct documents.

    Returns ``(id_col, n_lines, n_kept, clean_text)`` with
    ``clean_text`` the surviving lines joined by ``\\n`` in their
    original positions (empty string when nothing survives).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(text_col, "\n")).alias("pos", "line"))
    boiler = (line_frequencies(docs, text_col, id_col)
              .filter(F.col("n_docs") >= min_docs)
              .select("line_hash"))
    kept = (lines.withColumn("line_hash", F.md5("line"))
            .join(boiler, "line_hash", "left_anti"))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "line"))),
                     lambda s: s.line),
                 "\n").alias("clean_text"))
    )
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(text_col, "\n")).cast("long").alias("n_lines"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(id_col, "n_lines",
                F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
                F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    )
