"""Raw-format ingestion tests: schema-enforced CSV/JSONL readers,
corrupt-row quarantine, parquet landing round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from library_data_warehouse_and_business_analytics_system_spark.sources import io as RIO
from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import load_table

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("amount", T.DoubleType()),
])


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    raw = tmp_path / "in.csv"
    raw.write_text(
        "id,name,amount\n"
        "1,alpha,10.5\n"
        "2,beta,20.25\n"
        "oops,gamma,not_a_number\n"
        "4,delta,40.0\n")
    good, bad = RIO.read_csv(spark, str(raw), SCHEMA)
    assert good.count() == 3
    assert bad.count() == 1
    assert "oops" in bad.collect()[0][0]
    assert [f.name for f in good.schema] == ["id", "name", "amount"]


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    raw = tmp_path / "in.jsonl"
    raw.write_text(
        '{"id": 1, "name": "alpha", "amount": 10.5}\n'
        'this is not json\n'
        '{"id": 3, "name": "gamma", "amount": 30.0}\n')
    good, bad = RIO.read_jsonl(spark, str(raw), SCHEMA)
    assert good.count() == 2
    assert bad.count() == 1
    got = {r["id"]: r["amount"] for r in good.collect()}
    assert got == {1: 10.5, 3: 30.0}


def test_land_to_parquet_preserves_values(spark, sf_dir, tmp_path):
    """CSV round-trip of a real table: nation → csv → schema-read →
    parquet landing → exact match."""
    nation = load_table(spark, sf_dir, "nation")
    csv_dir = str(tmp_path / "nation_csv")
    nation.coalesce(1).write.option("header", True).csv(csv_dir)
    good, bad = RIO.read_csv(spark, csv_dir, nation.schema)
    assert bad.count() == 0
    RIO.land_to_parquet(good, str(tmp_path / "nation_pq"))
    back = spark.read.parquet(str(tmp_path / "nation_pq"))
    assert sorted(map(tuple, back.collect())) \
        == sorted(map(tuple, nation.collect()))


def test_read_parquet_evolved_schema(spark, tmp_path):
    """Two file vintages: v1 lacks `score`, v2 adds it. The evolved
    reader must surface all rows with v1's scores as typed NULLs, and
    projecting to the expected schema must also drop a legacy column
    that only v1 had."""
    from library_data_warehouse_and_business_analytics_system_spark.sources.io import (
        read_parquet_evolved,
    )
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, "a", "legacy")],
                          "id long, name string, old string") \
        .write.mode("append").parquet(p)
    spark.createDataFrame([(2, "b", 0.5)],
                          "id long, name string, score double") \
        .write.mode("append").parquet(p)

    merged = read_parquet_evolved(spark, p)
    assert {"id", "name", "old", "score"} <= set(merged.columns)
    assert merged.count() == 2

    expected = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ])
    out = read_parquet_evolved(spark, p, expected)
    assert out.columns == ["id", "name", "score"]
    rows = {r.id: (r.name, r.score) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", 0.5)}
