"""Phase breakdown of ann_index_full_cycle (r13 session 2): same
params/inputs as the gate, each phase timed separately, plus a Spark
job count per phase (status tracker) so job-count overhead is visible
even on a contended host.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.ann_index import (  # noqa: E501
    ann_index_build,
    ann_index_delete,
    ann_index_maintain,
    ann_index_query,
    ann_index_upsert,
)
from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E501
    get_spark,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import (  # noqa: E501
    load_table,
)


def main() -> None:
    import shutil
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_ann_cycle")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()  # warm footers

    def phase(name, fn):
        all0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        all1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        print(f"{name:18s} {dt:7.2f}s  jobs={all1 - all0}", flush=True)
        return out

    for rep in range(2):
        root = tempfile.mkdtemp(prefix="ann_prof_")
        print(f"--- rep {rep}")
        phase("build", lambda: ann_index_build(
            spark, emb, "vec_id", "embedding", root,
            dim=64, n_cells=8, max_iter=2, seed=7))
        phase("delete", lambda: ann_index_delete(
            spark, root, emb.filter(F.col("vec_id") < 60).select("vec_id"),
            "vec_id"))
        delta = (emb.filter(F.col("vec_id") < 40)
                 .select("vec_id",
                         F.transform("embedding", lambda x: -x)
                         .alias("embedding")))
        phase("upsert_reroute", lambda: ann_index_upsert(
            spark, root, delta, "vec_id", "embedding", on_move="reroute"))
        phase("maintain", lambda: ann_index_maintain(
            spark, root, rebuild_tombstone_frac=0.0,
            dim=64, n_cells=8, max_iter=2, seed=7))
        queries = emb.filter(F.col("vec_id") < 8)
        phase("query", lambda: ann_index_query(
            spark, root, queries, "vec_id", "embedding",
            k=10, n_probe=8).collect())
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
