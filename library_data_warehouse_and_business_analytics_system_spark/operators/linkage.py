"""Entity resolution: blocked fuzzy string matching.

The reference's member pipeline standardizes names/addresses before
loading (`04_InitialLoading.sql`'s cleansing passes, E2/E3 in
SURVEY.md §2); the step it runs OUTSIDE the database — catching the
near-duplicate entities standardization can't collapse ("red bolt" /
"rod bolt") — is classic record linkage. Spark-first shape:

1. block on shared character q-grams (explode + equi-join on the
   gram key — never an all-pairs product);
2. prefilter with the length-difference necessary condition
   (``|len(a)-len(b)| ≤ d`` whenever ``lev(a,b) ≤ d``);
3. verify candidates with the built-in ``levenshtein`` (JVM codegen,
   integer-exact on every engine).

Losslessness: an edit operation destroys at most ``q`` q-grams, so
``lev(a,b) ≤ d`` implies the pair shares at least
``max(len)-q+1-q·d`` grams — POSITIVE whenever ``max(len) ≥ q(d+1)``.
With q=2, d=2 any pair of strings ≥6 chars is guaranteed a shared
block; shorter strings would need a fallback block (not needed on
this corpus — min name length 7, pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_ngrams(col: Column, q: int = 2) -> Column:
    """Distinct character q-grams (full string when shorter than q)."""
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1),
                   F.greatest(F.length(col) - F.lit(q - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(q))))


def blocked_fuzzy_name_pairs(df: DataFrame, name_col: str,
                             max_dist: int = 2, q: int = 2) -> DataFrame:
    """(name_a, name_b, dist): distinct normalized names within
    ``max_dist`` edits, via q-gram blocking + exact verify.

    Matching runs on DISTINCT names — entity resolution's candidate
    space is the key vocabulary, not the row count, so a hot name
    (a million rows of "red bolt") costs one blocking row, and the
    output maps back to rows with an equi-join on the name. The
    gram-keyed candidate join shuffles (the vocabulary grows with the
    data — no broadcast); candidate pairs are DISTINCT'd before the
    levenshtein verify so each pair is scored once."""
    names = (df.select(F.lower(F.trim(F.col(name_col))).alias("nm"))
             .distinct()
             .withColumn("ln", F.length("nm")))
    grams = names.select(
        "nm", "ln", F.explode(char_ngrams(F.col("nm"), q)).alias("g"))
    a = grams.select(F.col("nm").alias("name_a"),
                     F.col("ln").alias("la"), "g")
    b = grams.select(F.col("nm").alias("name_b"),
                     F.col("ln").alias("lb"), "g")
    cand = (
        a.join(b, "g")
        .filter((F.col("name_a") < F.col("name_b"))
                & (F.abs(F.col("la") - F.col("lb")) <= max_dist))
        .select("name_a", "name_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", F.col("dist").cast("int").alias("dist"))
    )


def fuzzy_match_clusters(pairs: DataFrame,
                         names: DataFrame) -> DataFrame:
    """(name, canonical): connected components over the match pairs
    via the shared iterative min-label propagation
    (operators/dedup.py's closure), giving each name the
    lexicographically-smallest reachable name as canonical — the
    survivorship rule a dedup merge applies. ``names`` is the
    single-column universe frame (singletons map to themselves)."""
    from .dedup import connected_components

    edges = pairs.select(F.col("name_a").alias("a"),
                         F.col("name_b").alias("b"))
    uni = names.toDF("nm").distinct()
    return (connected_components(edges, uni, "nm")
            .toDF("name", "canonical"))
