"""Distributed k-means over embedding columns.

The assignment step — the part that touches every row — is pure
DataFrame algebra: squared L2 distance folded in index order with
``F.aggregate``/``F.zip_with`` (JVM codegen, no Python), argmin via
``array_min`` over (distance, centroid) structs so ties break to the
lowest centroid id. Centroid re-estimation is a posexplode +
two-level hash aggregate keyed (cluster, dim): the 16× map-side
fan-out collapses in the partial phase, so the shuffle carries
k × dims rows — constant in the corpus.

Only the k × dims centroid table ever reaches the driver (Lloyd's
iteration needs the new centroids as literals for the next
assignment pass); the corpus itself never moves. That is the
standard distributed k-means shape — at 100 TB each iteration is
one scan + one tiny shuffle.

Determinism: distances accumulate in index order (both here and in
the DuckDB oracle), so assignment with FIXED centroids is bit-exact
across engines. Re-estimated centroids involve an order-dependent
float mean, so the oracle-gated query covers the assignment step
and the iterative fit is pinned against numpy in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance, folded in index order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(emb: DataFrame, centroids: DataFrame,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    centroid_id: str = "cluster_id",
                    centroid_vec: str = "centroid") -> DataFrame:
    """Assign each vector to its nearest centroid.

    ``centroids`` is a k-row frame — broadcast-crossed into the
    corpus (k × N scoring is the semantics; the small side is the
    centroid table, same shape as ``cosine_topk``'s query side).
    Returns (id, cluster_id, dist) with dist the squared L2
    distance; ties go to the lowest cluster_id via struct ordering.
    """
    scored = emb.crossJoin(F.broadcast(
        centroids.select(F.col(centroid_id).alias("_cid"),
                         F.col(centroid_vec).alias("_cvec"))))
    dist = sq_dist(F.col(vec_col), F.col("_cvec"))
    best = (
        scored.select(F.col(id_col), F.struct(dist.alias("d"),
                                              F.col("_cid").alias("cid"))
                      .alias("cand"))
        .groupBy(id_col)
        .agg(F.min("cand").alias("best"))
    )
    return best.select(
        F.col(id_col),
        F.col("best.cid").alias("cluster_id"),
        F.col("best.d").alias("dist"),
    )


def recompute_centroids(assigned: DataFrame, emb: DataFrame,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Mean vector per cluster via posexplode + (cluster, dim) agg.

    Shuffle output is k × dims rows regardless of corpus size; the
    per-dim partial sums combine map-side.
    """
    exploded = (
        assigned.join(emb.select(id_col, vec_col), id_col)
        .select("cluster_id",
                F.posexplode(F.col(vec_col)).alias("dim", "x"))
    )
    per_dim = exploded.groupBy("cluster_id", "dim").agg(
        F.avg(F.col("x").cast("double")).alias("m"))
    return (
        per_dim.groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
             .alias("pairs"))
        .select("cluster_id",
                F.transform(F.col("pairs"), lambda p: p["m"])
                .alias("centroid"))
    )


def semantic_dedup_pairs(emb: DataFrame, centroids: DataFrame,
                         threshold: float,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         max_cluster_size: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then search for near-duplicate pairs only
    WITHIN each cluster — the clustering bounds the quadratic
    pairwise stage to per-cluster work.

    Returns (cluster_id, a, b, cos) for within-cluster pairs with
    cosine ≥ ``threshold``. The pair join is an equi-join on
    cluster_id (never a global cartesian); with k ≈ √N centroids
    the expected per-cluster size is √N, so total pair work is
    ~N^1.5 instead of N² — and each cluster's pairs land on one
    reducer keyed by cluster_id, so clusters process in parallel.

    ``max_cluster_size`` is the scale guard for DEGENERATE data (a
    near-duplicate flood collapsing into one cluster): the k ≈ √N
    sizing bounds the EXPECTED cluster, not the worst case, and a
    10⁶-member cluster means 5·10¹¹ pairs on one reducer. SemDeDup's
    semantics need every within-cluster pair, so the guard does not
    silently sample — it RAISES with the offending cluster sizes, and
    the remedy is explicit: re-cluster with larger k, or pre-collapse
    exact/MinHash duplicates (operators/dedup.py) before the
    embedding stage, which is what a duplicate flood actually calls
    for."""
    from ..functions.vectors import cosine_from_norms, dot, l2_norm_sq

    assigned = assign_clusters(emb, centroids, vec_col, id_col)
    if max_cluster_size is not None:
        over = (assigned.groupBy("cluster_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > max_cluster_size)
                .orderBy(F.desc("n")).limit(5).collect())
        if over:
            sizes = {r["cluster_id"]: r["n"] for r in over}
            raise ValueError(
                "semantic_dedup_pairs: cluster(s) exceed "
                f"max_cluster_size={max_cluster_size}: {sizes} — "
                "re-cluster with larger k or run exact/MinHash dedup "
                "before the embedding stage")
    # norm² computed ONCE per vector BEFORE the pair join: the pair
    # expression then makes a single array pass (the dot) instead of
    # three — at n²/k pair counts that's a 3× cut in HOF work, and
    # bit-identical (same sqrt/multiply/divide tree as cosine()).
    side = (assigned.join(emb.select(id_col, vec_col), id_col)
            .withColumn("_nsq", l2_norm_sq(F.col(vec_col))))
    a = side.select(F.col("cluster_id"),
                    F.col(id_col).alias("a"),
                    F.col(vec_col).alias("_va"),
                    F.col("_nsq").alias("_na"))
    b = side.select(F.col("cluster_id"),
                    F.col(id_col).alias("b"),
                    F.col(vec_col).alias("_vb"),
                    F.col("_nsq").alias("_nb"))
    return (
        a.join(b, "cluster_id")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", cosine_from_norms(
            dot(F.col("_va"), F.col("_vb")),
            F.col("_na"), F.col("_nb")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("cluster_id", "a", "b", "cos")
    )


def prototype_prune(emb: DataFrame, centroids: DataFrame,
                    per_cluster: int,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """D4-style prototypicality ranking (Tirumala et al. 2023,
    arXiv:2308.12284): within each cluster, the points CLOSEST to
    the centroid are the most prototypical — dense-region redundancy
    that D4 prunes after semantic dedup. Returns the ``per_cluster``
    most prototypical points per cluster as (cluster_id, vec_id,
    dist, proto_rank), rank 1 = closest.

    The window partitions on cluster_id; per-partition size is the
    cluster population, bounded by the same k ≈ √N sizing that keeps
    SemDeDup's pairwise stage tractable.
    """
    assigned = assign_clusters(emb, centroids, vec_col, id_col)
    w = (Window.partitionBy("cluster_id")
         .orderBy(F.col("dist").asc(), F.col(id_col)))
    return (
        assigned.withColumn("proto_rank", F.row_number().over(w))
        .filter(F.col("proto_rank") <= per_cluster)
        .select("cluster_id", id_col, "dist", "proto_rank")
    )


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 5,
               vec_col: str = "embedding", id_col: str = "vec_id",
               ) -> tuple[DataFrame, DataFrame]:
    """Lloyd's algorithm: init from the k lowest-id vectors, then
    ``iters`` rounds of assign → re-estimate. Returns
    (assignments, centroids). Each iteration collects only the
    k × dims centroid table to the driver.
    """
    init = (
        emb.orderBy(id_col).limit(k)
        .select(F.col(id_col).alias("cluster_id"),
                F.col(vec_col).alias("centroid"))
    )
    # Renumber centroids 0..k-1 so cluster ids are stable labels.
    rows = init.collect()
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in r["centroid"]])
         for i, r in enumerate(rows)],
        "cluster_id int, centroid array<double>")
    assigned = assign_clusters(emb, centroids, vec_col, id_col)
    for _ in range(iters):
        new = {r["cluster_id"]: [float(x) for x in r["centroid"]]
               for r in recompute_centroids(assigned, emb,
                                            vec_col, id_col).collect()}
        # A cluster that lost every member keeps its previous
        # centroid (the standard Lloyd's convention) instead of
        # silently dropping out of the model.
        prev = {r["cluster_id"]: list(r["centroid"])
                for r in centroids.collect()}
        centroids = spark.createDataFrame(
            [(cid, new.get(cid, c)) for cid, c in sorted(prev.items())],
            "cluster_id int, centroid array<double>")
        assigned = assign_clusters(emb, centroids, vec_col, id_col)
    return assigned, centroids
