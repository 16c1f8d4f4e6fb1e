"""Exact-substring span-scrub semantics (operators/substring.py).

The oracle gate pins bit-exactness on the real corpus; these pin the
semantics on constructed inputs where the right answer is knowable by
hand."""

from __future__ import annotations

import pytest

from library_data_warehouse_and_business_analytics_system_spark.operators.substring import (
    duplicated_span_scrub, window_hashes,
)

SHARED = "one two three four five six seven eight"  # exactly k=8 tokens


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {SHARED} gamma delta"),
            (2, f"{SHARED} epsilon zeta eta theta iota kappa"),
            (3, "totally unique text with no repeated windows at all"),
            (4, "short doc"),  # < k tokens: never scrubbed
            # within-doc repetition only — cross-doc scrub must NOT touch
            (5, f"{SHARED.replace('one', 'uno')} "
                f"{SHARED.replace('one', 'uno')}"),
        ],
        ["doc_id", "text"])
    rows = duplicated_span_scrub(df, k=8).collect()
    return {r["doc_id"]: r for r in rows}


def test_shared_span_removed_from_both_docs(scrubbed):
    assert scrubbed[1]["kept_text"] == "alpha beta gamma delta"
    assert scrubbed[1]["covered_tokens"] == 8
    assert (scrubbed[2]["kept_text"]
            == "epsilon zeta eta theta iota kappa")


def test_unique_and_short_docs_untouched(scrubbed):
    assert scrubbed[3]["covered_tokens"] == 0
    assert scrubbed[3]["dup_frac"] == 0.0
    assert (scrubbed[3]["kept_text"]
            == "totally unique text with no repeated windows at all")
    assert scrubbed[4]["covered_tokens"] == 0
    assert scrubbed[4]["kept_text"] == "short doc"


def test_within_doc_repeat_is_not_cross_doc(scrubbed):
    # doc 5 repeats its own 8-token phrase; no OTHER doc shares it.
    assert scrubbed[5]["covered_tokens"] == 0


def test_window_hashes_count_and_bounds(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h i")],
                               ["doc_id", "text"])  # 9 tokens, k=8 → 2
    rows = window_hashes(df, k=8).collect()
    assert sorted(r["start"] for r in rows) == [1, 2]


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(
        [(i, f"prefix{i} {SHARED} suffix{i} pad pad pad")
         for i in range(30)],
        ["doc_id", "text"])
    one = duplicated_span_scrub(docs.repartition(1), k=8).collect()
    many = duplicated_span_scrub(docs.repartition(13), k=8).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(one, key=key) == sorted(many, key=key)
    # every doc shares the middle span → all scrubbed
    assert all(r["covered_tokens"] == 8 for r in one)


def test_self_repeat_keeps_first_occurrence(spark):
    from library_data_warehouse_and_business_analytics_system_spark.operators.substring import (
        self_repeat_scrub,
    )

    df = spark.createDataFrame(
        [(1, "a b c d a b c d"),      # full phrase repeated
         (2, "x y z unique words"),   # no repeats
         (3, "loop loop loop loop loop")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in self_repeat_scrub(df, k=2).collect()}
    assert rows[1]["kept_text"] == "a b c d"
    assert rows[1]["repeated_tokens"] == 4
    assert rows[2]["repeated_tokens"] == 0
    assert rows[2]["kept_text"] == "x y z unique words"
    # "loop"*5: windows at 1..4 identical; repeats at 2,3,4 cover
    # positions 2..5 — only the very first token survives
    assert rows[3]["kept_text"] == "loop"


def test_self_and_cross_doc_scrubs_are_independent(spark):
    """The same corpus through both scrubs: a cross-doc shared span
    is untouched by the self-repeat scrub and vice versa."""
    from library_data_warehouse_and_business_analytics_system_spark.operators.substring import (
        duplicated_span_scrub, self_repeat_scrub,
    )

    nine_tails = " ".join(["tail"] * 9)
    df = spark.createDataFrame(
        [(1, f"{SHARED} {nine_tails}"),
         (2, f"{SHARED} other closing words entirely here")],
        ["doc_id", "text"])
    cross = {r["doc_id"]: r
             for r in duplicated_span_scrub(df, k=8).collect()}
    selfr = {r["doc_id"]: r for r in self_repeat_scrub(df, k=8).collect()}
    assert cross[1]["covered_tokens"] == 8      # only the shared span
    # tail×9 → all-tail windows at starts 9 and 10; the repeat at 10
    # covers positions 10..17 — the stutter, not the shared span
    assert selfr[1]["repeated_tokens"] == 8
    assert selfr[2]["repeated_tokens"] == 0
