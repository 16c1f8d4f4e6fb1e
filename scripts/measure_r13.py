"""Round-13 measurement harness (guide §1): isolate each query with the
noop sink, label jobs, capture explain("formatted") into
plans/r13/<name>_<tag>.txt.

Usage: python scripts/measure_r13.py <tag> [name ...]
With no names, measures the heavy set below.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from library_data_warehouse_and_business_analytics_system_spark.plans import QUERIES
from library_data_warehouse_and_business_analytics_system_spark.session import get_spark

HEAVY = [
    "exact_substring_scrub", "lsh_ann_topk_forced", "ngram_jaccard_dups",
    "dedup_kept_corpus", "ann_index_lifecycle", "ann_index_reroute",
    "pq_ann_topk", "dedup_canonical_keep", "copurchase_pagerank",
    "dedup_clusters", "minhash_lsh_pairs", "self_repeat_scrub",
    "ann_index_pruned_probe", "order_price_outliers", "dedup_incremental",
    "item_cf_similar_parts", "copurchase_triangles", "tfidf_top_terms",
    "dsir_importance_weights", "simhash_pairs", "bitext_margin_pairs_capped",
    "part_hierarchy_rollup", "embedding_near_dups", "semantic_dedup_pairs",
    "ivf_ann_topk", "events_daily_ewma_split", "ann_index_full_cycle",
]


def main() -> None:
    import os
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEAVY
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure_r13")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    plans_dir = REPO / "plans" / "r13"
    plans_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        spec = QUERIES[name]
        spark.sparkContext.setJobDescription(f"r13 warm: {name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()   # warm
        warm = time.perf_counter() - t0
        try:
            (plans_dir / f"{name}_{tag}.txt").write_text(
                df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        except Exception:
            (plans_dir / f"{name}_{tag}.txt").write_text("explain failed")
        spark.sparkContext.setJobDescription(f"r13 timed: {name}")
        t0 = time.perf_counter()
        df2 = spec.fn(spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        out[name] = round(dt, 3)
        print(f"{name:32s} warm={warm:7.2f}s timed={dt:7.2f}s", flush=True)
    print(json.dumps(out))
    (plans_dir / f"timings_{tag}.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
