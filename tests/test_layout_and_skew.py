"""Physical-layout tests: partition pruning actually prunes, bucketed
joins actually avoid the shuffle, salted operators match their plain
equivalents. These are the 100 TB design contracts (SURVEY.md §4)
asserted on the plans themselves, not just on results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators import skew as SK
from library_data_warehouse_and_business_analytics_system_spark.sources import warehouse as WH
from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def part_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wh"))
    WH.write_partitioned(load_table(spark, sf_dir, "orders"), "orders", d)
    return d


def test_partition_pruning(spark, part_dir):
    orders = WH.read_partitioned(spark, part_dir, "orders")
    pruned = orders.filter(F.col("o_year") == 1997)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "o_year" in plan
    # pruned scan must read strictly fewer files than the full scan
    n_all = orders.select(F.input_file_name()).distinct().count()
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    assert 0 < n_pruned < n_all
    # correctness: partition column agrees with the derivation
    bad = pruned.filter(F.year("o_orderdate") != 1997).count()
    assert bad == 0


def test_widen_then_clip_prunes_range(spark, part_dir):
    """The LAG widen-scan pattern (cal_year BETWEEN from-1 AND to,
    LQY_query1.txt:50) becomes a partition-range predicate."""
    orders = WH.read_partitioned(spark, part_dir, "orders")
    widened = orders.filter(F.col("o_year").between(1996, 1998))
    years = [r["o_year"] for r in
             widened.select("o_year").distinct().collect()]
    assert sorted(years) == [1996, 1997, 1998]
    assert "PartitionFilters" in _plan(widened)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lt, ot = WH.write_bucketed_pair(spark, li, orders, str(tmp_path),
                                    n_buckets=4, suffix="t1")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (spark.table(lt).join(
            spark.table(ot),
            F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus").count())
        plan = _plan(joined)
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        # the join itself must not shuffle either side
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result matches the plain join
        plain = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                 .groupBy("o_orderstatus").count())
        assert sorted(map(tuple, joined.collect())) \
            == sorted(map(tuple, plain.collect()))
        assert join_section is not None
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        WH.drop_bucketed_pair(spark, lt, ot)


def test_heavy_hitters(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    hh = SK.heavy_hitters(li, ["l_returnflag"], min_share=0.2)
    rows = {r["l_returnflag"]: r["share"] for r in hh.collect()}
    assert rows  # returnflag has ~3 values, all above 20%
    assert all(s >= 0.2 for s in rows.values())


def test_salted_join_matches_plain(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey")
    plain = cust.join(nation, ["c_nationkey"]).select("c_custkey", "n_name")
    salted = SK.salted_join(cust, nation, ["c_nationkey"], n_salts=8) \
        .select("c_custkey", "n_name")
    assert sorted(map(tuple, plain.collect())) \
        == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").limit(500)
    cust = load_table(spark, sf_dir, "customer") \
        .filter(F.col("c_custkey") % 2 == 0) \
        .withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, ["o_custkey"], "left") \
        .select("o_orderkey", "c_name")
    salted = SK.salted_join(orders, cust, ["o_custkey"], how="left",
                            n_salts=4).select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect()), key=str) \
        == sorted(map(tuple, salted.collect()), key=str)


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = SK.salted_agg(
        li, ["l_returnflag"],
        {"sum_qty": F.sum(F.col("l_quantity").cast("decimal(18,4)")),
         "count_lines": F.count(F.lit(1)),
         "max_price": F.max("l_extendedprice")},
        n_salts=8)
    exp = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("count_lines"),
        F.max("l_extendedprice").alias("max_price"))
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, exp.collect()))


def test_salted_agg_rejects_non_decomposable(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        SK.salted_agg(li, ["l_returnflag"],
                      {"avg_qty": F.avg("l_quantity")}).collect()


def test_fact_surrogate_key_unique_contiguous(spark, sf_dir):
    from library_data_warehouse_and_business_analytics_system_spark.operators.surrogate import (
        with_fact_surrogate_key,
    )

    li = load_table(spark, sf_dir, "lineitem").repartition(7)
    keyed = with_fact_surrogate_key(li, "row_sk", start=100_001)
    n = li.count()
    stats = keyed.agg(
        F.countDistinct("row_sk").alias("d"),
        F.min("row_sk").alias("lo"), F.max("row_sk").alias("hi")).collect()[0]
    assert stats["d"] == n
    assert stats["lo"] == 100_001 and stats["hi"] == 100_000 + n
    # and no global shuffle to one partition: plan has no
    # single-partition Exchange for the id assignment
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL sketch (approx_count_distinct) within its documented rsd on
    real cardinalities — the constant-memory path for 100 TB distinct
    counts (exact countDistinct shuffles every distinct value)."""
    li = load_table(spark, sf_dir, "lineitem")
    got = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact")).collect()[0]
    assert abs(got["approx"] - got["exact"]) / got["exact"] < 0.06


def test_corpus_layout_prunes_language_partitions(spark, sf_dir, tmp_path):
    """lang= partition pruning must reach the scan: a lang='en' filter
    over the partitioned corpus reads only the en directory, and the
    layout bounds files per partition."""
    import os

    from library_data_warehouse_and_business_analytics_system_spark.sources.warehouse import (  # noqa: E501
        write_corpus_layout,
    )
    docs = load_table(spark, sf_dir, "documents")
    path = write_corpus_layout(docs, str(tmp_path), files_per_lang=3)

    langs = [d for d in os.listdir(path) if d.startswith("lang=")]
    assert len(langs) >= 2
    for d in langs:
        n_files = len([f for f in os.listdir(f"{path}/{d}")
                       if f.endswith(".parquet")])
        assert 1 <= n_files <= 3

    back = spark.read.parquet(path)
    en = back.filter(F.col("lang") == "en")
    plan = en._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*lang[^\]]*\]", plan)
    assert m, "lang filter must become a partition filter"
    expected = docs.filter(F.col("lang") == "en").count()
    assert en.count() == expected


def test_zorder_layout_shrinks_bounding_boxes_both_dims(spark, tmp_path):
    """Z-ordered files must carry small footer [min,max] ranges in
    BOTH clustered columns (the information file skipping consumes);
    a lexicographic sort only clusters the leading column. Content is
    preserved exactly."""
    from library_data_warehouse_and_business_analytics_system_spark.sources.zorder import (
        file_bounds, write_zordered,
    )

    n = 40_000
    df = (spark.range(n)
          .select((F.col("id") % 200).cast("long").alias("x"),
                  F.floor(F.col("id") / 200).cast("long").alias("y"),
                  F.col("id").alias("payload")))

    z_path = str(tmp_path / "z")
    s_path = str(tmp_path / "s")
    write_zordered(df, z_path, ["x", "y"], n_files=16)
    (df.repartitionByRange(16, "x")      # single-column sort layout
     .sortWithinPartitions("x")
     .write.mode("overwrite").parquet(s_path))

    def mean_frac_range(path, col, span):
        bounds = file_bounds(path, ["x", "y"])
        fr = [(b[col][1] - b[col][0]) / span for b in bounds if col in b]
        return sum(fr) / len(fr)

    # x: both layouts cluster it
    assert mean_frac_range(z_path, "x", 199) < 0.6
    # y: the sorted layout's files span ~the whole y range; z-order
    # must shrink it by >2x
    y_sorted = mean_frac_range(s_path, "y", n / 200 - 1)
    y_z = mean_frac_range(z_path, "y", n / 200 - 1)
    assert y_sorted > 0.8
    assert y_z < y_sorted / 2, (y_z, y_sorted)

    # pure layout rewrite: content identical
    back = spark.read.parquet(z_path)
    assert back.count() == n
    assert back.exceptAll(df).count() == 0


def test_aqe_splits_skewed_join(spark):
    """AQE's OptimizeSkewedJoin must split a hot partition at runtime:
    with one key holding ~90% of the left side and broadcast disabled,
    the final adaptive plan's sort-merge join is marked skew=true.
    This is the no-code-change answer to a hot join key at 100 TB —
    salting (operators/skew.py) remains for aggregations, where AQE
    cannot help."""
    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id"))
         .alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("pl"))
    right = spark.range(0, 1000).select(F.col("id").alias("k"),
                                        (F.col("id") * 2).alias("v"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = left.join(right, "k")
        # materialize THIS plan (count() would execute a different
        # query tree and leave j's own adaptive plan unfinalized)
        n = len(j.collect())
        # 180k hot rows (k=7 matches) + the 100 multiples of 10 < 1000
        assert n == 180_100
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
