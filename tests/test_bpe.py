"""Distributed BPE training (operators/bpe.py) versus a pure-Python
reference implementation of the Sennrich et al. algorithm: identical
merge sequences, identical final tokenizations, identical vocab."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.bpe import (
    bpe_apply, bpe_train, word_freqs,
)


# --- pure-Python reference (dict-based, the textbook algorithm) ----------


def _ref_symbols(word: str) -> tuple[str, ...]:
    return tuple(list(word[:-1]) + [word[-1] + "</w>"])


def _ref_pair_counts(freqs):
    c = collections.Counter()
    for syms, f in freqs.items():
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += f
    return c


def _ref_merge(syms, x, y):
    out, pending = [], None
    for s in syms:
        if pending == x and s == y:
            out.append(x + y)
            pending = None
        else:
            if pending is not None:
                out.append(pending)
            pending = s
    if pending is not None:
        out.append(pending)
    return tuple(out)


def _ref_train(word_freq: dict[str, int], n_merges: int):
    freqs = {_ref_symbols(w): f for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        counts = _ref_pair_counts(freqs)
        if not counts:
            break
        # count DESC, then pair ASC — the operator's tie-break
        (x, y), _n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((x, y))
        freqs = {_ref_merge(s, x, y): f for s, f in freqs.items()}
    vocab = collections.Counter()
    for syms, f in freqs.items():
        for s in syms:
            vocab[s] += f
    return merges, dict(vocab)


# --- fixtures ------------------------------------------------------------


_CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


@pytest.fixture(scope="module")
def wf(spark):
    docs = spark.createDataFrame([(t,) for t in _CORPUS], "text string")
    return word_freqs(docs).localCheckpoint(eager=True)


def test_word_freqs(wf):
    got = {r["word"]: r["freq"] for r in wf.collect()}
    assert got == {"low": 5, "lower": 2, "newest": 6, "wider": 2, "new": 2}


def test_merge_sequence_matches_reference(spark, wf):
    word_freq = {r["word"]: r["freq"] for r in wf.collect()}
    want_merges, want_vocab = _ref_train(word_freq, 10)
    got_merges, vocab_df = bpe_train(wf, 10)
    assert got_merges == want_merges
    got_vocab = {r["symbol"]: r["freq"] for r in vocab_df.collect()}
    assert got_vocab == want_vocab


def test_apply_matches_training_state(spark, wf):
    """Applying the learned merges to the SAME words reproduces the
    training-end tokenization (greedy replay in training order)."""
    word_freq = {r["word"]: r["freq"] for r in wf.collect()}
    merges, _ = bpe_train(wf, 6)
    applied = {r["word"]: tuple(r["syms"])
               for r in bpe_apply(wf, merges).collect()}
    freqs = {_ref_symbols(w): f for w, f in word_freq.items()}
    state = {w: _ref_symbols(w) for w in word_freq}
    for x, y in merges:
        state = {w: _ref_merge(s, x, y) for w, s in state.items()}
        freqs = {_ref_merge(s, x, y): f for s, f in freqs.items()}
    assert applied == state


def test_greedy_leftmost_overlap(spark):
    """aaaa = [a a a a</w>] under merge (a, a): leftmost pair wins,
    the overlapping middle occurrence is consumed, and the final
    a</w> is a DIFFERENT symbol that must not merge."""
    docs = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    wf2 = word_freqs(docs)
    merges, _ = bpe_train(wf2, 1)
    assert merges == [("a", "a")]
    out = {tuple(r["syms"]) for r in bpe_apply(wf2, merges).collect()}
    assert out == {("aa", "a", "a</w>")}
    assert out == {_ref_merge(_ref_symbols("aaaa"), "a", "a")}


def test_early_stop_when_fully_merged(spark):
    docs = spark.createDataFrame([("ab ab ab",)], "text string")
    merges, vocab = bpe_train(word_freqs(docs), 50)
    # [a, b</w>] fully merges in ONE step; training stops early
    assert merges == [("a", "b</w>")]
    got = {r["symbol"]: r["freq"] for r in vocab.collect()}
    assert got == {"ab</w>": 3}


def test_trains_on_documents_table(spark, sf_dir):
    """Smoke at testdata scale: 8 merges over the documents corpus,
    deterministic across two runs."""
    from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import load_table
    docs = load_table(spark, sf_dir, "documents")
    wf3 = word_freqs(docs).localCheckpoint(eager=True)
    m1, _ = bpe_train(wf3, 8)
    m2, _ = bpe_train(wf3, 8)
    assert m1 == m2 and len(m1) == 8
    assert all(isinstance(x, str) and isinstance(y, str) for x, y in m1)
