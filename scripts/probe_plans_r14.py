"""r14 plan-shape probes for the two changes whose evidence lives
INSIDE an operator (the registry gates' final explain hides them):

1. iterative-fixpoint checkpoint partitioning (session.no_aqe): the
   pagerank-style iteration join over a checkpointed edge frame —
   before: `Scan ExistingRDD ... UnknownPartitioning` + Exchange +
   Sort on the edge side every iteration; after: `hashpartitioning`
   preserved, edge side exchange- and sort-free.
2. tx_diff_parts fused signed-count diff — before: two exceptAll
   rewrites (2 aggregates, both sides scanned twice); after: one
   union + one aggregate + one replicate-explode.

Usage: python scripts/probe_plans_r14.py <tag>   (before|after)
Writes plans/r14/fixpoint_iterjoin_<tag>.txt and tx_diff_parts_<tag>.txt.
Run with tag=before from a worktree of the r13 close.
"""
from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E501
    get_spark,
)


def fmt(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    out = REPO / "plans" / "r14"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("probe_plans_r14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # 1. the fixpoint iteration join, exactly pagerank's ew shape
    from library_data_warehouse_and_business_analytics_system_spark.operators import (  # noqa: E501
        graph,
    )
    e = spark.range(0, 100000).select(
        (F.col("id") % 5000).alias("src"), (F.col("id") % 3700).alias("dst"))
    pr = graph.pagerank(e, iters=1)  # builds ew/nodes the module's way
    # reproduce the iteration join against the module-built ew by
    # re-deriving it through the public surface: one more iteration
    # step over the returned pr frame's lineage is opaque, so rebuild
    # ew the way pagerank does and dump ITS join plan.
    try:
        no_aqe = graph._no_aqe
        with no_aqe(spark):
            ew = (e.select("src", "dst").distinct()
                  .withColumn("odeg", F.count(F.lit(1))
                              .over(Window.partitionBy("src")))
                  .localCheckpoint())
    except AttributeError:  # r13 tree: plain checkpoint under AQE
        ew = (e.select("src", "dst").distinct()
              .withColumn("odeg", F.count(F.lit(1))
                          .over(Window.partitionBy("src")))
              .localCheckpoint())
    prf = pr.withColumnRenamed("id", "src")
    (out / f"fixpoint_iterjoin_{tag}.txt").write_text(
        fmt(ew.join(prf, "src").select("dst", "pr", "odeg")))

    # 2. tx_diff_parts
    from library_data_warehouse_and_business_analytics_system_spark.sources import (  # noqa: E501
        txlog,
    )
    with tempfile.TemporaryDirectory() as d:
        t = f"{d}/orders"
        df1 = spark.range(0, 1000).select(
            F.col("id").alias("o_orderkey"),
            (F.lit(2019) + F.col("id") % 3).cast("int").alias("o_year"),
            (F.col("id") * 1.5).alias("o_total"))
        txlog.tx_write_parts(df1, t, "o_year", mode="overwrite")
        v1 = txlog.tx_latest_id(t)
        txlog.tx_merge_parts(
            spark, t,
            df1.filter(F.col("o_orderkey") < 100)
            .withColumn("o_total", F.col("o_total") + 1.0),
            keys=["o_orderkey"], part_col="o_year")
        feed = txlog.tx_diff_parts(spark, t, v1)
        (out / f"tx_diff_parts_{tag}.txt").write_text(fmt(feed))
    print("wrote", tag)


if __name__ == "__main__":
    main()
