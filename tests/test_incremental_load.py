"""EP3 incremental-load tests: dim inserts continue the surrogate
sequence, SCD2 updates expire-and-insert, fact MERGEs are idempotent,
retro-correction caps overdueDays — mirroring the smoke-fixture style
of 07_SubsequentLoading.sql:172-277 (seed a handful of known new rows,
assert the warehouse absorbed exactly them)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark import schema as S
from library_data_warehouse_and_business_analytics_system_spark.generators.library_data import (
    AS_OF, generate,
)
from library_data_warehouse_and_business_analytics_system_spark.plans.library import (
    incremental as INC, initial_load,
)


@pytest.fixture(scope="module")
def oltp(spark):
    return {k: v.cache()
            for k, v in generate(seed=42, scale=0.02).to_spark(spark).items()}


@pytest.fixture(scope="module")
def dw(spark, oltp):
    return {k: v.cache() for k, v in initial_load(spark, oltp, AS_OF).items()}


def test_insert_new_dim_members_continues_sequence(spark, oltp, dw):
    new = spark.createDataFrame(
        [("M9001", "NEW PERSON", "011-1", "x@y.z", "female", 30,
          "1 Road, Alpha City, Penang, Malaysia", "active",
          dt.date(2024, 5, 1), dt.date(2025, 4, 30))],
        S.OLTP_SCHEMAS["members"])
    before_max = dw["dim_members"].agg(F.max("memberKey")).collect()[0][0]
    out = INC.insert_new_dim_members(dw["dim_members"], new, AS_OF)
    added = out.filter(F.col("memberId") == "M9001").collect()
    assert len(added) == 1
    assert added[0]["memberKey"] == before_max + 1
    assert added[0]["state"].upper() == "PENANG"
    assert added[0]["city"].upper() == "ALPHA CITY"
    # idempotent: same delta again is a no-op
    again = INC.insert_new_dim_members(out, new, AS_OF)
    assert again.count() == out.count()


def test_scd2_book_price_change(spark, oltp, dw):
    effective = dt.date(2024, 7, 1)
    row = oltp["book_titles"].filter(F.col("bookId") == "B0001").collect()[0]
    changed = spark.createDataFrame(
        [(row["bookId"], row["title"], row["author"], row["genre"],
          row["publicationYear"], row["purchasePrice"],
          round(row["salesPrice"] + 10.0, 2), row["popularity"])],
        S.OLTP_SCHEMAS["book_titles"])
    out = INC.scd2_update_dim_book(dw["dim_book"], changed, effective)
    versions = out.filter(F.col("bookId") == "B0001") \
        .orderBy("effective_date").collect()
    assert len(versions) == 2
    old, new = versions
    assert old["curr_ind"] == "N"
    assert old["expiration_date"] == effective - dt.timedelta(days=1)
    assert new["curr_ind"] == "Y"
    assert new["price"] == pytest.approx(row["salesPrice"] + 10.0, abs=0.005)
    # untouched books keep exactly one current version
    n_books = dw["dim_book"].select("bookId").distinct().count()
    assert out.filter(F.col("curr_ind") == "Y").count() == n_books


def test_merge_fact_sales_idempotent(spark, oltp, dw):
    an_order = oltp["book_orders"].limit(1).collect()[0]
    a_book = oltp["book_titles"].limit(1).collect()[0]
    delta_sd = spark.createDataFrame(
        [("SD99991", an_order["orderId"], a_book["bookId"], 2, 0.0, 50.0)],
        S.OLTP_SCHEMAS["sales_details"])
    from library_data_warehouse_and_business_analytics_system_spark.plans.library.etl import load_fact_sales
    delta = load_fact_sales(delta_sd, oltp["book_orders"],
                            oltp["book_titles"], oltp["discounts"],
                            dw["dim_date"], dw["dim_members"], dw["dim_book"])
    n0 = dw["fact_sales"].count()
    once = INC.merge_fact_sales(dw["fact_sales"], delta)
    assert once.count() == n0 + 1
    twice = INC.merge_fact_sales(once, delta)
    assert twice.count() == n0 + 1
    got = twice.filter(F.col("sales_id") == "SD99991").collect()
    assert len(got) == 1 and got[0]["quantity"] == 2


def test_cap_overdue_days(dw):
    capped = INC.cap_overdue_days(dw["fact_borrowing"], cap=15)
    assert capped.filter(F.col("overdueDays") > 15).count() == 0
    # rows previously over the cap are recoded to 0, not clipped to 15
    over = dw["fact_borrowing"].filter(F.col("overdueDays") > 15).count()
    if over:
        zeroed = capped.filter(F.col("overdueDays") == 0).count()
        base_zero = dw["fact_borrowing"].filter(
            F.col("overdueDays") == 0).count()
        assert zeroed == base_zero + over


def test_subsequent_load_end_to_end(spark, oltp, dw):
    new_member = spark.createDataFrame(
        [("M9002", "ANOTHER NEW", "011-2", "a@b.c", "male", 40,
          "2 Road, Beta Town, Perak, Malaysia", "active",
          dt.date(2024, 6, 1), dt.date(2025, 5, 31))],
        S.OLTP_SCHEMAS["members"])
    new_title = spark.createDataFrame(
        [("B9002", "Brand New Book", "A. Author", "Fiction", 2024,
          8.0, 10.0, 4.0)],
        S.OLTP_SCHEMAS["book_titles"])
    out = INC.subsequent_load(
        spark, dw, oltp,
        {"members": new_member, "book_titles": new_title}, AS_OF)
    assert out["dim_members"].filter(
        F.col("memberId") == "M9002").count() == 1
    assert out["dim_book"].filter(F.col("bookId") == "B9002").count() == 1
    assert out["fact_borrowing"].filter(
        F.col("overdueDays") > 15).count() == 0
    # facts untouched when no fact deltas arrive
    assert out["fact_sales"].count() == dw["fact_sales"].count()
