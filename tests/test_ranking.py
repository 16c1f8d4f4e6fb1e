"""Two-phase distribution-rank operator (operators/ranking.py):
must equal Spark's own single-window NTILE / PERCENT_RANK /
CUME_DIST bit-for-bit under a strict order, while never planning a
global single-partition window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.ranking import (
    with_global_rank, with_rank_stats,
)


def _df(spark, n, parts=6):
    # non-trivial value distribution incl. duplicates in the value
    # column (the id tie-break makes the total order strict)
    return (spark.range(n).repartition(parts)
            .withColumn("v", (F.col("id") * 37 % 11).cast("long")))


def _window_truth(df, n_tiles):
    w = Window.orderBy(F.col("v").desc(), "id")
    return df.select(
        "id", "v",
        F.row_number().over(w).cast("long").alias("global_rank"),
        F.ntile(n_tiles).over(w).alias("ntile"),
        F.percent_rank().over(w).alias("percent_rank"),
        F.cume_dist().over(w).alias("cume_dist"))


@pytest.mark.parametrize("n,tiles", [(97, 10), (100, 10), (5, 7),
                                     (64, 8), (23, 4)])
def test_rank_stats_equal_single_window(spark, n, tiles):
    df = _df(spark, n)
    got = with_rank_stats(df, [F.col("v").desc(), F.col("id")],
                          n_tiles=tiles, n_partitions=5)
    want = _window_truth(df, tiles)
    cols = ["id", "v", "global_rank", "ntile", "percent_rank", "cume_dist"]
    g = sorted(tuple(r) for r in got.select(*cols).collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w     # includes the raw doubles — bit-exact


def test_rank_independent_of_partitioning(spark):
    df = _df(spark, 211, parts=3)
    a = with_rank_stats(df, [F.col("v").desc(), F.col("id")],
                        n_tiles=10, n_partitions=2)
    b = with_rank_stats(df, [F.col("v").desc(), F.col("id")],
                        n_tiles=10, n_partitions=13)
    cols = ["id", "global_rank", "ntile", "percent_rank", "cume_dist"]
    assert sorted(map(tuple, a.select(*cols).collect())) == \
        sorted(map(tuple, b.select(*cols).collect()))


def test_global_rank_is_gapless_and_count_exact(spark):
    df = _df(spark, 150)
    ranked, n = with_global_rank(df, [F.col("v").desc(), F.col("id")],
                                 n_partitions=7)
    assert n == 150
    ranks = sorted(r["global_rank"] for r in ranked.collect())
    assert ranks == list(range(1, 151))


def test_no_single_partition_global_window(spark):
    """The point of the operator: the plan must contain no
    Exchange SinglePartition (ntile's naive plan does)."""
    df = _df(spark, 100)
    plan = with_rank_stats(
        df, [F.col("v").desc(), F.col("id")], n_tiles=10,
        n_partitions=4)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    naive = df.select(F.ntile(10).over(
        Window.orderBy(F.col("v").desc(), "id")).alias("t"))
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in naive_plan   # what we are avoiding
