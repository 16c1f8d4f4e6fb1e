"""Small-file compaction: layout changes, content doesn't."""

from __future__ import annotations

from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.sources.compaction import (
    compact_parquet, plan_compaction,
)


def _fragmented(spark, path, n_files=40):
    (spark.range(0, 20_000).withColumn("v", F.col("id") * 2)
     .repartition(n_files).write.mode("overwrite").parquet(path))


def test_compaction_reduces_files_preserves_content(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    _fragmented(spark, src)
    before = plan_compaction(spark, src, target_mb=128)
    assert before["n_files"] >= 40 and before["fragmented"]
    result = compact_parquet(spark, src, dst, target_mb=128)
    assert result["after"]["n_files"] < before["n_files"] / 4
    assert not result["after"]["fragmented"]
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_compaction_respects_hive_partitions(spark, tmp_path):
    src, dst = str(tmp_path / "frag_p"), str(tmp_path / "compact_p")
    df = (spark.range(0, 10_000)
          .withColumn("year", (F.col("id") % 3 + 2020).cast("int"))
          .withColumn("v", F.col("id") * 3))
    df.repartition(30).write.mode("overwrite").partitionBy("year").parquet(src)
    compact_parquet(spark, src, dst, target_mb=128,
                    partition_cols=["year"])
    out = spark.read.parquet(dst)
    # partition column survives as a directory key and values round-trip
    assert sorted(r.year for r in out.select("year").distinct().collect()) \
        == [2020, 2021, 2022]
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).collect()[0][0] == \
        spark.read.parquet(src).agg(F.sum("v")).collect()[0][0]
