"""Iterative graph analytics over edge DataFrames: PageRank.

Complements the connected-components operator
(``operators/dedup.py dedup_clusters``) with the other classic
iterative fixpoint. Each iteration is one equi-join (ranks onto
edges by source) plus one grouped aggregate (contributions by
destination) — the standard Pregel-on-DataFrames shape: no driver
data movement, shuffle keyed by node id, iteration count fixed by
the caller.

Determinism: per-destination contribution sums fold in sorted-source
order (``array_sort(collect_list(...))`` + ``F.aggregate``), so the
resulting rank doubles are reproducible bit-for-bit — and match a
DuckDB oracle that folds ``list(x ORDER BY src)`` the same way.
A plain ``SUM`` over doubles would be addition-order-dependent and
could never hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 2, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             exact_fold: bool = True) -> DataFrame:
    """PageRank over a directed edge list (one row per distinct edge).

    Returns (id, pr) for every node appearing as a source or
    destination. Nodes without out-edges contribute nothing (their
    mass leaks, the simple non-redistributing variant); nodes
    without in-edges keep the base term. ``iters`` fixed-point
    iterations from a uniform start — each is one shuffle join plus
    one grouped fold, so cost is O(iters × |E|) with no growth in
    state.

    ``exact_fold=True`` (the oracle-gating mode) materializes each
    destination's contributions as a sorted array before summing —
    bit-reproducible, but the array is in-degree-sized, and on a
    power-law web graph a hub's in-degree is millions: at 100 TB
    that array OOMs the reducer. ``exact_fold=False`` is the scale
    path: a plain two-phase SUM (map-side partial aggregation, state
    one double per node) whose only cost is addition-order
    nondeterminism in the last ulp — invisible at any tolerance a
    ranking consumer uses. The equivalence of the two modes is
    pinned in tests/test_search_ops.py.
    """
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct())
    n_nodes = nodes.count()  # scalar: fixes N for the base term
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))

    base = (1.0 - damping) / n_nodes
    pr = nodes.select("id", (F.lit(1.0) / F.lit(n_nodes)).alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(pr.withColumnRenamed("id", "src"), "src")
            .join(outdeg, "src")
            .select(F.col("dst").alias("id"), "src",
                    (F.col("pr") / F.col("odeg")).alias("c"))
        )
        if exact_fold:
            summed = (
                contrib.groupBy("id")
                .agg(F.array_sort(F.collect_list(F.struct("src", "c")))
                     .alias("cs"))
                .select("id",
                        F.aggregate(F.col("cs"), F.lit(0.0),
                                    lambda acc, s: acc + s["c"])
                        .alias("s"))
            )
        else:
            summed = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        pr = (
            nodes.join(summed, "id", "left")
            .select("id",
                    (F.lit(base)
                     + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                     ).alias("pr"))
        )
    return pr
