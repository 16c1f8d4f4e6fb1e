"""Scale-up probes for the round-7 session-3 additions:

1. exact-substring span scrub at 1x / 8x documents — window hashing
   and the shared-window membership join are hash-keyed shuffles;
   growth must stay ~linear (the duplicated-window set grows with
   the corpus, which is why the join is NOT broadcast);
2. CDC chunk dedup at 1x / 8x — same posture, plus the per-document
   running-count window (partitioned BY DOC, so scale-free);
3. DSIR importance weights at 1x / 8x — the distribution tables are
   bounded by n_buckets BY CONSTRUCTION, so the broadcast side stays
   fixed while the corpus grows: the legality proof for the only
   broadcast in the plan;
4. fuzzy name matching at 1x / 8x ROWS with a FIXED name vocabulary —
   candidate space is the distinct-name table, so wall time must be
   ~flat in row count (the ER analogue of the dedup-probe flatness);
5. PQ: fit on the fixed 500-vector sample as the corpus grows 1x/8x
   (must be flat — sample-bounded), and ADC scoring 1x/8x (~linear).

Replicates the sf0.1 tables in memory with disjoint ids. Prints one
JSON line per probe. Run manually; results cited in ROUND7.md.
    python scripts/probe_scale_round7c.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from library_data_warehouse_and_business_analytics_system_spark.operators.cdchunk import (  # noqa: E402
    chunk_dedup_stats,
)
from library_data_warehouse_and_business_analytics_system_spark.operators.importance import (  # noqa: E402
    dsir_importance,
)
from library_data_warehouse_and_business_analytics_system_spark.operators.linkage import (  # noqa: E402
    blocked_fuzzy_name_pairs,
)
from library_data_warehouse_and_business_analytics_system_spark.operators.quantize import (  # noqa: E402
    pq_fit, pq_topk,
)
from library_data_warehouse_and_business_analytics_system_spark.operators.substring import (  # noqa: E402
    duplicated_span_scrub,
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


def main():
    spark = get_spark()
    docs = load_table(spark, SF_DIR, "documents").cache()
    docs.count()
    docs8 = replicate(docs, "doc_id", 8).cache()
    docs8.count()
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    emb.count()
    emb8 = replicate(emb, "vec_id", 8).cache()
    emb8.count()
    part = load_table(spark, SF_DIR, "part").cache()
    part.count()
    part8 = replicate(part, "p_partkey", 8).cache()
    part8.count()
    out = {}

    docs64 = replicate(docs8, "doc_id", 8, stride=100_000_000)

    t1 = best_of(lambda: duplicated_span_scrub(docs, k=8).count())
    t8 = best_of(lambda: duplicated_span_scrub(docs8, k=8).count())
    t64 = best_of(lambda: duplicated_span_scrub(docs64, k=8).count())
    out["substring_scrub_1x_8x_64x"] = [t1, t8, t64,
                                        round(t64 / t1, 2)]

    t1 = best_of(lambda: chunk_dedup_stats(docs, 8).count())
    t8 = best_of(lambda: chunk_dedup_stats(docs8, 8).count())
    t64 = best_of(lambda: chunk_dedup_stats(docs64, 8).count())
    out["cdc_chunk_1x_8x_64x"] = [t1, t8, t64, round(t64 / t1, 2)]

    pred = F.col("lang") == "en"
    t1 = best_of(lambda: dsir_importance(docs, pred, 4096).count())
    t8 = best_of(lambda: dsir_importance(docs8, pred, 4096).count())
    t64 = best_of(lambda: dsir_importance(docs64, pred, 4096).count())
    out["dsir_1x_8x_64x"] = [t1, t8, t64, round(t64 / t1, 2)]

    t1 = best_of(lambda: blocked_fuzzy_name_pairs(part, "p_name").count())
    t8 = best_of(lambda: blocked_fuzzy_name_pairs(part8, "p_name").count())
    out["fuzzy_rows_1x_8x"] = [t1, t8, round(t8 / t1, 2)]

    train = emb.filter(F.col("vec_id") < 500)
    train8 = emb8.filter(F.col("vec_id") < 500)
    t1 = best_of(lambda: pq_fit(train, "embedding", 64, iters=3), n=1)
    t8 = best_of(lambda: pq_fit(train8, "embedding", 64, iters=3), n=1)
    out["pq_fit_sample_1x_8x"] = [t1, t8, round(t8 / t1, 2)]

    books = pq_fit(train, "embedding", 64, iters=3)
    queries = emb.filter(F.col("vec_id") < 8)
    t1 = best_of(lambda: pq_topk(emb, queries, "embedding", "vec_id",
                                 books, k=10, rerank=40).count())
    t8 = best_of(lambda: pq_topk(emb8, queries, "embedding", "vec_id",
                                 books, k=10, rerank=40).count())
    out["pq_adc_1x_8x"] = [t1, t8, round(t8 / t1, 2)]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
