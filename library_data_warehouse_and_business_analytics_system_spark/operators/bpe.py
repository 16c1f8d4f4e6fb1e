"""Distributed BPE (byte-pair-encoding) vocabulary training.

The engine's text surface already counts tokens with a BPE-ish regex
(``plans/llm_ops.py doc_bpe_token_counts``); this operator LEARNS the
merge table itself from a corpus — the tokenizer-training half of a
training-data pipeline (Sennrich et al. 2016, arXiv:1508.07909).

Scale posture — the classic trick, distributed:

- Training never iterates over the corpus. One shuffle builds the
  DISTINCT-WORD frequency table (Heaps-law sized, ~|vocab| rows, not
  |corpus| rows); every merge round runs on that table weighted by
  frequency — exactly how reference BPE implementations train, but
  with the word table sharded across executors instead of a dict.
- A merge round is: adjacent-pair counts (explode + sum(freq), the
  partial aggregate combines map-side) → global argmax with a total
  tie-break (count DESC, pair ASC — deterministic across partition
  counts) → apply the merge to each word's symbol sequence with a
  single JVM-side fold (no Python UDF). Only words that CONTAIN the
  pair are rewritten; the rest pass through untouched.
- Driver traffic per round is ONE row (the winning pair). Rounds are
  inherently sequential — that is BPE's definition — so the loop is
  n_merges Spark jobs over the word table.

Greedy leftmost application (``aaa`` + merge ``a·a`` → ``aa a``)
matches the reference algorithm; the fold carries a one-symbol
lookbehind so overlapping occurrences resolve left to right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the one
    corpus-sized shuffle in the whole training run."""
    return (
        docs.select(F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _to_symbols(words: DataFrame) -> DataFrame:
    """Initial symbol sequences: one character per symbol, plus the
    reference end-of-word marker on the final character."""
    n = F.length("word")
    ch = lambda i: F.col("word").substr(i, F.lit(1))  # noqa: E731
    syms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(i == n, F.concat(ch(i), F.lit("</w>")))
                   .otherwise(ch(i)))
    return words.withColumn("syms", syms)


def _merge_expr(x: str, y: str):
    """Greedy leftmost merge of adjacent (x, y) → x||y over ``syms``,
    as one JVM-side fold. The accumulator carries (out, pending):
    ``pending`` is a one-symbol lookbehind; seeing ``y`` while
    ``pending == x`` emits the merged symbol and clears the
    lookbehind, so ``aaa`` under ``a·a`` becomes ``aa, a``."""
    merged = F.lit(x + y)

    def step(acc, s):
        hit = acc["pending"].eqNullSafe(F.lit(x)) & (s == F.lit(y))
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(merged)))
             .otherwise(F.when(acc["pending"].isNull(), acc["out"])
                        .otherwise(F.concat(acc["out"],
                                            F.array(acc["pending"]))))
             .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s)
             .alias("pending"),
        )

    def finish(acc):
        return F.when(acc["pending"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pending"])))

    init = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("out"),
        F.lit(None).cast("string").alias("pending"))
    return F.aggregate(F.col("syms"), init, step, finish)


def _pair_counts(symwords: DataFrame) -> DataFrame:
    pairs = F.filter(
        F.zip_with(F.col("syms"),
                   F.slice(F.col("syms"), 2, F.greatest(
                       F.size("syms") - 1, F.lit(0))),
                   lambda a, b: F.struct(a.alias("x"), b.alias("y"))),
        lambda p: p["y"].isNotNull())
    return (
        symwords.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.sum("freq").alias("n"))
    )


def bpe_train(words: DataFrame, n_merges: int) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` merges from a (word, freq) table. Returns
    (merge list in order, final symbol-frequency table). Stops early
    when no adjacent pair remains. Deterministic: ties broken by
    (count DESC, x ASC, y ASC)."""
    symwords = _to_symbols(words).select("syms", "freq") \
        .localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (_pair_counts(symwords)
               .orderBy(F.desc("n"), "x", "y")
               .limit(1)
               .collect())
        if not top:
            break
        x, y = top[0]["x"], top[0]["y"]
        merges.append((x, y))
        has_pair = F.exists(
            F.zip_with(F.col("syms"),
                       F.slice(F.col("syms"), 2, F.greatest(
                           F.size("syms") - 1, F.lit(0))),
                       lambda a, b: (a == F.lit(x)) & b.eqNullSafe(F.lit(y))),
            lambda v: v)
        symwords = (symwords.withColumn(
            "syms", F.when(has_pair, _merge_expr(x, y)).otherwise(F.col("syms")))
            .localCheckpoint(eager=True))
    vocab = (symwords.select(F.explode("syms").alias("symbol"), "freq")
             .groupBy("symbol").agg(F.sum("freq").alias("freq")))
    return merges, vocab


def bpe_apply(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenize a (word, ...) table with a learned merge list: the
    merges replay in training order (the reference algorithm's
    greedy application)."""
    out = _to_symbols(words)
    for x, y in merges:
        out = out.withColumn("syms", _merge_expr(x, y))
    return out
