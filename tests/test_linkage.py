"""Record-linkage semantics (operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.linkage import (
    blocked_fuzzy_name_pairs, char_ngrams, fuzzy_match_clusters,
)


def test_char_ngrams(spark):
    rows = spark.range(1).select(
        char_ngrams(F.lit("abcab"), 2).alias("g"),
        char_ngrams(F.lit("a"), 2).alias("short")).first()
    assert rows["g"] == ["ab", "bc", "ca"]  # distinct, order of first occurrence
    assert rows["short"] == ["a"]


def test_blocking_is_lossless_vs_all_pairs(spark):
    """On names ≥ 6 chars the q-gram bound guarantees completeness;
    verify against a brute-force all-pairs join."""
    names = [(f"widget {c}x",) for c in "abcdefgh"] + [
        ("widget ax!",), ("totally other",), ("tootally other",)]
    df = spark.createDataFrame(names, ["name"])
    blocked = {(r["name_a"], r["name_b"], r["dist"])
               for r in blocked_fuzzy_name_pairs(df, "name", 2).collect()}
    uniq = df.select(F.lower(F.trim("name")).alias("nm")).distinct()
    brute = {(r["a"], r["b"], r["d"]) for r in
             uniq.alias("x").join(uniq.alias("y"),
                                  F.col("x.nm") < F.col("y.nm"))
             .select(F.col("x.nm").alias("a"), F.col("y.nm").alias("b"),
                     F.levenshtein("x.nm", "y.nm").cast("int").alias("d"))
             .filter(F.col("d") <= 2).collect()}
    assert blocked == brute and len(brute) > 10


def test_hot_name_costs_one_blocking_row(spark):
    """A name repeated a thousand times must not blow up the
    candidate space — matching runs on distinct names."""
    df = spark.createDataFrame(
        [(i, "red bolt") for i in range(1000)] + [(9999, "rod bolt")],
        ["row_id", "name"])
    pairs = blocked_fuzzy_name_pairs(df, "name", 2).collect()
    assert [(r["name_a"], r["name_b"], r["dist"]) for r in pairs] \
        == [("red bolt", "rod bolt", 1)]


def test_clusters_pick_min_canonical(spark):
    df = spark.createDataFrame(
        [("red bolt",), ("rod bolt",), ("rad bolt",), ("unrelated",)],
        ["name"])
    pairs = blocked_fuzzy_name_pairs(df, "name", 2)
    names = df.select(F.lower(F.trim("name")))
    cl = {r["name"]: r["canonical"]
          for r in fuzzy_match_clusters(pairs, names).collect()}
    assert cl["red bolt"] == cl["rod bolt"] == cl["rad bolt"] == "rad bolt"
    assert cl["unrelated"] == "unrelated"
