"""Exact-substring span scrubbing across the corpus.

"Deduplicating Training Data Makes Language Models Better" (Lee et
al., ACL 2022) removes any text span whose exact k-token window
recurs elsewhere in the corpus — finer-grained than document-level
dedup (a boilerplate paragraph inside an otherwise-unique page gets
cut, the page survives). The suffix-array construction the paper uses
is single-machine; the Spark-first equivalent is window hashing:

1. slide a k-token window over every document (JVM higher-order
   functions — ``transform(sequence(...))`` over the token array, no
   Python in the loop) and hash each window to 16 bytes;
2. one hash-partitioned window pass over the window hashes marks
   windows appearing in ≥2 distinct documents (min ≠ max doc id over
   the wh partition). The shared-window set grows with the corpus
   (same Heaps-law posture as the boilerplate line set, VERDICT r6),
   so the pass SHUFFLES on the fixed-width hash key — never a forced
   broadcast — and, unlike the previous distinct-count + membership
   join, needs only ONE exchange and ONE evaluation of the
   tokenize+md5 subtree (r13);
3. every token position covered by any shared window is marked
   (bounded k-fan-out explode), and each document is reassembled
   from its uncovered tokens in position order.

Cross-doc span dedup at 100 TB therefore costs: one tokenize pass,
one hash-keyed shuffle (the shared-window window pass), one bounded
explode, one per-doc regroup — all map-reduce shaped, nothing
quadratic, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def window_hashes(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, start, wh): md5 of every k-token window, 1-based
    ``start``. Documents shorter than ``k`` tokens contribute no
    windows (and are therefore never scrubbed)."""
    # The token array is MATERIALIZED behind a projection before the
    # per-window lambda touches it (r13): interpreted HOF lambdas
    # re-evaluate any subtree embedded in the lambda body once per
    # element, so the inline form re-ran the whole
    # split(trim(lower(text))) once PER WINDOW — ~|doc| times per row
    # (the trap documented at functions/text.shingles_from_tokens;
    # measured at sf0.1: 3.2 s → 0.65 s, output identical). The
    # boundary holds because ``_toks`` is referenced more than once.
    base = (docs.select(F.col(id_col).alias("doc_id"),
                        TX.tokens(F.lower(F.col(text_col))).alias("_toks"))
            .filter(F.size("_toks") >= k))
    wins = F.transform(
        F.sequence(F.lit(1), F.size("_toks") - F.lit(k - 1)),
        lambda i: F.struct(
            i.alias("start"),
            F.md5(F.array_join(F.slice(F.col("_toks"), i, k), " "))
            .alias("wh")))
    return (base.select("doc_id", F.explode(wins).alias("w"))
            .select("doc_id", F.col("w.start").alias("start"),
                    F.col("w.wh").alias("wh")))


def _reassemble(docs: DataFrame, covered: DataFrame, k: int,
                id_col: str, text_col: str, *, covered_col: str,
                with_frac: bool) -> DataFrame:
    """Rebuild each document from its uncovered tokens, given one
    (doc_id, _cov: array<int>) row per affected doc.

    Per-doc HOF reassembly (r13, guide §2.4): kept positions are
    ``array_except(sequence(1, n), _cov)`` — array_except builds a
    hash set of the covered side, so the per-row cost is O(n +
    |covered|), NOT the O(n·|covered|) an array_contains probe per
    position would pay on adversarial documents — and preserves the
    ascending position order of the sequence, which is exactly the
    sorted-struct order the previous per-position regroup produced.
    Output contract unchanged: one row per non-null-text document
    (split() never returns an empty array, so size ≥ 1; a null text
    produced no posexplode rows before and is filtered here)."""
    base = (docs.select(F.col(id_col).alias("doc_id"),
                        TX.tokens(F.lower(F.col(text_col))).alias("_toks"))
            .filter(F.col("_toks").isNotNull()))
    cov = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    kept = F.transform(
        F.array_except(F.sequence(F.lit(1), F.size("_toks")), cov),
        lambda p: F.element_at(F.col("_toks"), p))
    out = (base.join(covered, "doc_id", "left_outer")
           .select("doc_id",
                   F.size("_toks").cast("bigint").alias("n_tokens"),
                   F.size(cov).cast("bigint").alias(covered_col),
                   F.array_join(kept, " ").alias("kept_text")))
    if with_frac:
        out = out.withColumn(
            "dup_frac", F.col(covered_col).cast("double")
            / F.col("n_tokens").cast("double"))
        return out.select("doc_id", "n_tokens", covered_col, "dup_frac",
                          "kept_text")
    return out.select("doc_id", "n_tokens", covered_col, "kept_text")


def duplicated_span_scrub(docs: DataFrame, k: int = 8,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Remove every token covered by a cross-document k-token window.

    Returns one row per document: (doc_id, n_tokens, covered_tokens,
    dup_frac, kept_text). ``dup_frac`` is the single exact integer
    division covered/n_tokens; ``kept_text`` is the surviving tokens
    rejoined in position order (sorted-struct reassembly — the
    deterministic order both engines reproduce)."""
    wh = window_hashes(docs, k, id_col, text_col)

    # Windows recurring across ≥2 DOCUMENTS (within-doc repeats are
    # Lee et al.'s self-duplication — a different operator). "≥2
    # distinct docs" ≡ min(doc_id) ≠ max(doc_id) over the wh
    # partition, computed as ONE window pass (r13, guide §2.4): the
    # previous two-phase DISTINCT-count + membership join shuffled on
    # wh twice AND re-executed the whole tokenize+md5 window subtree
    # for the second branch (Catalyst does not share it across the
    # join). Measured at sf0.1: 8.1 s → 4.3 s, output identical; the
    # shuffle key is still the fixed-width hash, never text, and a
    # hot window hash's partition is df-sized in either shape.
    w_wh = Window.partitionBy("wh")
    covered = (
        wh.withColumn("_shared",
                      F.min("doc_id").over(w_wh) != F.max("doc_id").over(w_wh))
        .filter(F.col("_shared"))
        # collect_set reduces to ONE row per doc, so the reassembly
        # below is a per-DOC join instead of the previous per-POSITION
        # one (r13, guide §2.4). It aggregates window STARTS, not the
        # k-exploded positions (r14, guide §2.3 "shuffle fewer
        # bytes"): the k-fan-out explode pushed k× rows through the
        # partial aggregate and k× ints through the doc_id exchange;
        # expanding starts to covered positions is a per-row HOF over
        # the final set (array_distinct ∘ flatten ∘ sequence) — the
        # POSITION SET is identical.
        .groupBy("doc_id")
        .agg(F.collect_set("start").alias("_starts"))
        .select("doc_id",
                F.array_distinct(F.flatten(F.transform(
                    "_starts",
                    lambda s: F.sequence(s, s + F.lit(k - 1)))))
                .alias("_cov"))
    )

    return _reassemble(docs, covered, k, id_col, text_col,
                       covered_col="covered_tokens", with_frac=True)


def self_repeat_scrub(docs: DataFrame, k: int = 8,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Remove WITHIN-document repeats: every token covered only by
    k-token windows whose exact text already occurred EARLIER in the
    same document is scrubbed (the first occurrence survives).

    The complement of :func:`duplicated_span_scrub` — Lee et al.'s
    self-duplication case (generation loops, boilerplate stuttering,
    scraper glitches). A position is covered iff it lies in some
    window whose (doc, hash) has a strictly smaller start — computed
    with one per-document min-over-window (partition = one document's
    windows, bounded by doc length), the bounded k-fan-out explode,
    and the same position-ordered reassembly. Returns (doc_id,
    n_tokens, repeated_tokens, kept_text)."""
    wh = window_hashes(docs, k, id_col, text_col)

    w = Window.partitionBy("doc_id", "wh")
    repeats = (wh.withColumn("first_start", F.min("start").over(w))
               .filter(F.col("start") > F.col("first_start")))
    covered = (
        repeats
        # same starts-not-positions aggregation shape as
        # duplicated_span_scrub (r14, guide §2.3): identical set.
        .groupBy("doc_id")
        .agg(F.collect_set("start").alias("_starts"))
        .select("doc_id",
                F.array_distinct(F.flatten(F.transform(
                    "_starts",
                    lambda s: F.sequence(s, s + F.lit(k - 1)))))
                .alias("_cov")))

    return _reassemble(docs, covered, k, id_col, text_col,
                       covered_col="repeated_tokens", with_frac=False)
