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
