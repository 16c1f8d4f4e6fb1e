"""Unit tests for the reference scalar surface (functions/scalars.py)
on tiny in-memory frames — the E2-E6 standardization rules at the
exact boundary values the reference's CASE expressions use."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.functions import scalars as X


def _one(spark, expr, _schema=None, **cols):
    df = spark.createDataFrame([tuple(cols.values())],
                               _schema or list(cols.keys()))
    return df.select(expr.alias("v")).collect()[0]["v"]


@pytest.mark.parametrize("age,band", [
    (12, "BELOW 18"), (17, "BELOW 18"), (18, "18 TO 25"), (25, "18 TO 25"),
    (26, "26 TO 40"), (40, "26 TO 40"), (41, "41 TO 55"), (55, "41 TO 55"),
    (56, "56 TO 70"), (70, "56 TO 70"), (71, "71+"), (100, "UNKNOWN"),
])
def test_age_band_boundaries(spark, age, band):
    # E4 (05_InitialLoading.sql:237-246)
    assert _one(spark, X.age_band(F.col("a")), a=age) == band


def test_age_band_unknown(spark):
    assert _one(spark, X.age_band(F.col("a")), _schema="a int",
                a=None) == "UNKNOWN"


@pytest.mark.parametrize("g,n", [
    ("female", "F"), ("male", "M"), ("FEMALE", "F"), ("other", "U"),
])
def test_gender_norm(spark, g, n):
    # E5 (05_InitialLoading.sql:249-253)
    assert _one(spark, X.gender_norm(F.col("g")), g=g) == n


@pytest.mark.parametrize("raw,canon", [
    ("Non Fiction", "NON-FICTION"), ("Nonfiction", "NON-FICTION"),
    ("non-fiction", "NON-FICTION"), (" NON FICTION ", "NON-FICTION"),
    ("HIstory", "HISTORY"), ("Fiction", "FICTION"),
])
def test_canonical_genre(spark, raw, canon):
    # E6 (07_SubsequentLoading.sql:21-24)
    assert _one(spark, X.canonical_genre(F.col("g")), g=raw) == canon


def test_member_address_parse(spark):
    # E3: member state = 2nd-last comma part, city = 3rd-last
    # (05_InitialLoading.sql:256-277)
    addr = "12 Jalan Merdeka, Alpha City, Penang, Malaysia"
    assert _one(spark, X.member_state(F.col("a")), a=addr).upper() == "PENANG"
    assert _one(spark, X.member_city(F.col("a")), a=addr).upper() == "ALPHA CITY"


def test_supplier_address_parse(spark):
    # E3 supplier variant: state = 3rd-last, city = 4th-last
    # (05_InitialLoading.sql:302-315)
    addr = "9 Lorong Satu, Beta Town, Perak, 31000, Malaysia"
    assert _one(spark, X.supplier_state(F.col("a")), a=addr).upper() == "PERAK"
    assert _one(spark, X.supplier_city(F.col("a")), a=addr).upper() == "BETA TOWN"


def test_fmt_id(spark):
    # fmt_id('PO', 12, 4) → 'PO0012' (01_helpers.sql:48-53)
    assert _one(spark, X.fmt_id("PO", F.col("n"), 4), n=12) == "PO0012"


def test_norm_popularity_and_money(spark):
    assert _one(spark, X.norm_popularity(F.col("p")), _schema="p double",
                p=7.5) == 5.0
    assert _one(spark, X.norm_popularity(F.col("p")), _schema="p double",
                p=None) == 3.0
    assert float(_one(spark, X.nonneg_money(F.col("m")), _schema="m double",
                      m=-3.2)) == 0.0


def test_expiry_after_renewals(spark):
    # ADD_MONTHS(reg, 12*(1+k)) - 1 (02_InsertMembers.sql:39-43)
    import datetime as dt
    got = _one(spark,
               X.expiry_after_renewals(F.col("r").cast("date"), F.col("k")),
               r="2020-01-15", k=1)
    assert got == dt.date(2022, 1, 14)
