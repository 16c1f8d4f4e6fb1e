"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k (exact, the recall yardstick).
Scale path: random-hyperplane LSH buckets (sign bits of seeded
projections) or IVF-style coarse quantization (nearest of k seeded
centroids), both pruning the candidate set before an exact re-rank.
Everything is built-in HOF arithmetic — no UDFs, no collect of the
corpus; the query set is the only broadcast side.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot


def brute_force_topk(corpus: DataFrame, queries: DataFrame, vec_col: str,
                     id_col: str, k: int = 10) -> DataFrame:
    """Exact cosine top-k for every query vector.

    Broadcast the (small) query side against the corpus — one scan of
    the corpus regardless of query count; per-query top-k via
    window ranking."""
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _seeded_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def random_hyperplane_buckets(df: DataFrame, vec_col: str, dim: int,
                              n_planes: int = 12, seed: int = 42) -> DataFrame:
    """Append an LSH ``bucket`` column: the n-bit sign pattern of
    seeded Gaussian projections. Cosine-close vectors land in the same
    bucket with high probability."""
    planes = _seeded_planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot(F.col(vec_col), plane) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0))
        bucket = bucket.bitwiseXOR(bit)
    return df.withColumn("bucket", bucket)


def lsh_topk(corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
             dim: int, k: int = 10, n_planes: int = 6, seed: int = 42,
             n_tables: int = 8) -> DataFrame:
    """ANN top-k: candidates = corpus rows sharing a bucket with the
    query in ANY of ``n_tables`` independent hash tables, re-ranked by
    exact cosine. Recall grows with n_tables; cost stays ~bucket-sized
    instead of corpus-sized.

    Tuning: hyperplane LSH collision prob per table is
    ``(1 − θ/π)^n_planes``. For clustered embeddings (θ small) a
    12-plane/4-table config is selective AND high-recall; for
    near-orthogonal corpora (the driver's synthetic vectors: top-1
    cosine ≈ 0.36 → θ ≈ 69°) selectivity has to be bought with
    candidates, hence the shallower 6-plane/8-table default. Callers
    with real embedding clusters should raise n_planes."""
    # All n_tables bucket assignments are computed in ONE projection and
    # exploded to (table, bucket) rows, so candidate generation is a
    # single equi-join on (table, bucket) instead of n_tables separate
    # join+union branches (one shuffle-free broadcast join; far smaller
    # plan). Same candidate set by construction.
    def hashed(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        tables = []
        for t in range(n_tables):
            planes = _seeded_planes(dim, n_planes, seed + 1000 * t)
            bucket = F.lit(0).cast("long")
            for i, p in enumerate(planes):
                plane = F.array(*[F.lit(x) for x in p])
                bit = F.when(dot(F.col(vec_col), plane) >= 0,
                             F.shiftleft(F.lit(1).cast("long"), i)) \
                    .otherwise(F.lit(0))
                bucket = bucket.bitwiseXOR(bit)
            tables.append(F.struct(F.lit(t).alias("table"),
                                   bucket.alias("bucket")))
        return df.select(
            F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec),
            F.explode(F.array(*tables)).alias("tb"),
        ).select(out_id, out_vec, "tb.table", "tb.bucket")

    cands = (
        F.broadcast(hashed(queries, "query_id", "qv"))
        .join(hashed(corpus, "neighbor_id", "cv"), ["table", "bucket"])
        .drop("table", "bucket")
    )
    scored = (
        cands.filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_topk(corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
             dim: int, k: int = 10, n_cells: int = 16, n_probe: int = 3,
             seed: int = 42) -> DataFrame:
    """IVF-style ANN: assign every corpus vector to its nearest of
    ``n_cells`` seeded random centroids (coarse quantizer); a query
    probes its ``n_probe`` nearest cells and re-ranks exactly.

    (Proper IVF trains centroids with k-means; seeded random centroids
    keep the operator deterministic and dependency-free — the plan
    shape, the part that matters at scale, is identical.)"""
    cents = _seeded_planes(dim, n_cells, seed)

    def cell_of(vec, probe: int):
        scored = F.array(*[
            F.struct(dot(vec, F.array(*[F.lit(x) for x in c])).alias("s"),
                     F.lit(i).alias("cell"))
            for i, c in enumerate(cents)
        ])
        return F.slice(F.array_sort(
            scored, lambda a, b: F.when(a.s > b.s, -1).when(a.s < b.s, 1)
            .otherwise(0)), 1, probe)

    c_assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        F.element_at(cell_of(F.col(vec_col), 1), 1).cell.alias("cell"))
    q_assigned = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(F.transform(cell_of(F.col(vec_col), n_probe),
                              lambda s: s.cell)).alias("cell"))
    scored = (
        F.broadcast(q_assigned).join(c_assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
