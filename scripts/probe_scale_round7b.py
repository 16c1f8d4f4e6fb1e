"""Scale-up probes for the round-7 late additions:

1. BM25 retrieval at 1x / 8x / 64x corpus — the query-term posting
   filter runs BEFORE any shuffle, so wall time should track the
   scan (~linear in rows), never the vocabulary;
2. TF-IDF top terms at 1x / 8x — the full-vocabulary df join is
   SHUFFLED (no broadcast hint); growth should stay ~linear;
3. SemDeDup within-cluster pairs at 1x / 8x corpus with k scaled as
   ~sqrt(N) (the paper's sizing) — pair-stage work ~N^1.5 in theory,
   but candidate generation stays an equi-join, so wall time must
   grow smoothly, not quadratically;
4. k-means assignment at 1x / 8x with fixed k — one scan, ~linear.

Replicates the sf0.1 tables in memory with disjoint ids (the
technique scripts/probe_scale_round7.py uses). Prints one JSON line
per probe. Run manually; results are cited in ROUND7.md.
    python scripts/probe_scale_round7b.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from library_data_warehouse_and_business_analytics_system_spark.operators import (  # noqa: E402
    clustering, search,
)
from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E402
    get_spark,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import (  # noqa: E402
    load_table,
)

SF_DIR = "/root/testdata/sf0.1"


def replicate(df, id_col, n_copies, stride=10_000_000):
    out = df
    for i in range(1, n_copies):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * stride)))
    return out


def best_of(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_spark("probe7b", shuffle_partitions=32)
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")

    # 1. BM25 at 1x / 8x / 64x
    terms = ["spark", "query", "join"]
    for mult in (1, 8, 64):
        d = replicate(docs, "doc_id", mult)
        wall = best_of(lambda: search.bm25_topk(d, terms, k=10)
                       .collect())
        print(json.dumps({"probe": "bm25_topk", "mult": mult,
                          "wall_sec": wall}))

    # 2. TF-IDF at 1x / 8x (vocabulary join shuffled)
    for mult in (1, 8):
        d = replicate(docs, "doc_id", mult)
        wall = best_of(lambda: search.tfidf_top_terms(d, per_doc=3)
                       .count())
        print(json.dumps({"probe": "tfidf_top_terms", "mult": mult,
                          "wall_sec": wall}))

    # 3. SemDeDup at 1x / 8x with k ~ sqrt(N)
    for mult, k in ((1, 70), (8, 200)):
        e = replicate(emb, "vec_id", mult)
        cents = (e.orderBy("vec_id").limit(k)
                 .select(F.col("vec_id").alias("cluster_id"),
                         F.col("embedding").alias("centroid")))
        wall = best_of(lambda: clustering.semantic_dedup_pairs(
            e, cents, threshold=0.4).count())
        print(json.dumps({"probe": "semantic_dedup_pairs",
                          "mult": mult, "k": k, "wall_sec": wall}))

    # 4. k-means assignment, fixed k=8
    for mult in (1, 8):
        e = replicate(emb, "vec_id", mult)
        cents = (e.filter(F.col("vec_id") < 8)
                 .select(F.col("vec_id").alias("cluster_id"),
                         F.col("embedding").alias("centroid")))
        wall = best_of(lambda: clustering.assign_clusters(e, cents)
                       .count())
        print(json.dumps({"probe": "kmeans_assign", "mult": mult,
                          "wall_sec": wall}))


if __name__ == "__main__":
    main()
