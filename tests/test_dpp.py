"""Dynamic partition pruning: a partitioned fact joined to a FILTERED
dim must scan only the partitions the dim's surviving keys name —
Spark injects the dim-side values into the fact scan at runtime
(``dynamicpruningexpression`` on the scan's partition filters). This
is the property that makes star joins on a partitioned 100 TB fact
read 2 years, not 30, when the dim filter keeps 2 years — without any
literal year predicate on the fact side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import load_table


def _partitioned_orders(spark, sf_dir, tmp_path):
    fact = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int"))
    out = str(tmp_path / "orders_by_year")
    fact.write.partitionBy("o_year").parquet(out)
    return spark.read.parquet(out)


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    fact = _partitioned_orders(spark, sf_dir, tmp_path)
    # the dim carries a real filter — DPP only injects the pruning
    # subquery when the build side is itself filtered (otherwise the
    # fact scan couldn't benefit)
    years = (spark.range(1990, 2005)
             .select(F.col("id").cast("int").alias("y"))
             .filter((F.col("y") >= 1996) & (F.col("y") <= 1997)))
    joined = (fact.join(years, fact.o_year == years.y)
              .groupBy("o_year")
              .agg(F.count(F.lit(1)).alias("n")))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    got = {r["o_year"]: r["n"] for r in joined.collect()}
    want = {r["o_year"]: r["n"] for r in
            (load_table(spark, sf_dir, "orders")
             .withColumn("o_year", F.year("o_orderdate").cast("int"))
             .filter(F.col("o_year").isin(1996, 1997))
             .groupBy("o_year").agg(F.count(F.lit(1)).alias("n"))
             .collect())}
    assert got == want and set(got) == {1996, 1997}


def test_static_partition_pruning_reads_subset(spark, sf_dir, tmp_path):
    """Literal partition predicates must reach the scan as partition
    filters (no dynamic subquery needed) — the number of row groups
    read is bounded by the named partitions."""
    fact = _partitioned_orders(spark, sf_dir, tmp_path)
    q = fact.filter(F.col("o_year") == 1995)
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "Scan parquet" in ln]
    assert scan
    assert "PartitionFilters" in plan
    n = q.count()
    want = (load_table(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate") == 1995).count())
    assert n == want > 0


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Runtime bloom-filter join pruning (SPARK-32268): a selective
    dim-side filter must inject a bloom_filter_agg on the dim and a
    might_contain probe onto the FACT side of a shuffled join, so
    fact rows that cannot match are dropped before the exchange —
    at 100 TB this is the difference between shuffling the whole
    fact and shuffling the matching slice. The size thresholds are
    lowered to simulate TB-scale inputs on the test data; the conf
    is restored afterwards."""
    from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import (
        load_table,
    )

    saved = {k: spark.conf.get(k) for k in (
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold")}
    try:
        assert spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".creationSideThreshold", "10MB")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = load_table(spark, sf_dir, "orders")
        cust = (load_table(spark, sf_dir, "customer")
                .filter(F.col("c_mktsegment") == "BUILDING"))
        j = orders.join(cust, orders.o_custkey == cust.c_custkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
