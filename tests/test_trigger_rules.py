"""Trigger-rule operator tests (SURVEY.md §2.10 trigger table).

The fixture generator applies the same business rules at generation
time, so re-deriving each column from the raw tables and comparing to
the generated column is a true differential test of the rule operators
— two independent implementations of 02_Trigger.sql must agree.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from library_data_warehouse_and_business_analytics_system_spark.generators.library_data import (
    AS_OF, generate,
)
from library_data_warehouse_and_business_analytics_system_spark.plans.library import rules as R


@pytest.fixture(scope="module")
def oltp(spark):
    d = generate(seed=42, scale=0.02).to_spark(spark)
    return {k: v.cache() for k, v in d.items()}


def test_auto_expire_membership(oltp):
    derived = R.auto_expire_membership(oltp["members"], AS_OF)
    # rule output must agree with the generator's status derivation
    mismatch = derived.alias("d").join(
        oltp["members"].alias("o"), "memberId").filter(
        F.col("d.memberStatus") != F.col("o.memberStatus")).count()
    assert mismatch == 0
    # and no active member may be past expiry
    bad = derived.filter((F.col("memberStatus") == "active")
                         & (F.col("expireDate") < F.lit(AS_OF))).count()
    assert bad == 0


def test_book_detail_violations_clean_and_dirty(spark, oltp):
    assert R.book_detail_violations(oltp["book_titles"], 2025).count() == 0
    dirty = spark.createDataFrame(
        [("B9998", "t", "a", "g", 2300, 1.0, 2.0, 3.0),
         ("B9999", "t", "a", "g", 2000, -5.0, 2.0, 3.0),
         ("B9997", "t", "a", "g", 2000, 1.0, 2.0, 9.9)],
        oltp["book_titles"].schema)
    got = {r["bookId"]: r["violation"]
           for r in R.book_detail_violations(dirty, 2025).collect()}
    assert got == {"B9998": "future_publication_year",
                   "B9999": "negative_price",
                   "B9997": "popularity_out_of_range"}


def test_derive_copy_status(oltp):
    derived = R.derive_copy_status(oltp["book_copies"],
                                   oltp["borrowed_books"])
    on_loan = (oltp["borrowed_books"]
               .filter(F.col("returnStatus").isin("On loan", "Overdue"))
               .select("copyId").distinct())
    not_borrowed = (derived.join(on_loan, "copyId", "left_semi")
                    .filter(~F.col("bookStatus")
                            .isin("borrowed", "unavailable")).count())
    assert not_borrowed == 0
    assert derived.count() == oltp["book_copies"].count()


def test_mark_attendance_matches_generator(oltp):
    derived = R.mark_attendance(oltp["staff_attendance"],
                                oltp["shift_schedules"], oltp["shift"])
    mismatch = derived.alias("d").join(
        oltp["staff_attendance"].alias("o"), "attendanceId").filter(
        F.col("d.attendanceStatus") != F.col("o.attendanceStatus")).count()
    assert mismatch == 0


def test_weekly_hours_violations(spark):
    shifts = spark.createDataFrame(
        [("SH1", "long", dt.datetime(2024, 1, 1, 8), dt.datetime(2024, 1, 1, 20))],
        "shiftId string, shiftType string, startTime timestamp, endTime timestamp")
    # 4 × 12h = 48h in one ISO week → violation; 3 × 12h = 36h → none
    sched = spark.createDataFrame(
        [(f"SC{i}", "SH1", "ST1", dt.date(2024, 5, 6 + i)) for i in range(4)]
        + [(f"SD{i}", "SH1", "ST2", dt.date(2024, 5, 6 + i)) for i in range(3)],
        "scheduleId string, shiftId string, staffId string, shiftDate date")
    got = R.weekly_hours_violations(sched, shifts).collect()
    assert len(got) == 1
    assert got[0]["staffId"] == "ST1" and got[0]["total_hours"] == 48.0


def test_borrow_window_clean(oltp):
    assert R.borrow_window_violations(
        oltp["borrowed_books"], oltp["members"]).count() == 0


def test_fine_amounts_match_generator(oltp):
    nulled = oltp["fines"].withColumn("fineAmount",
                                      F.lit(None).cast("double"))
    derived = R.derive_fine_amounts(nulled, oltp["borrowed_books"],
                                    oltp["book_copies"], oltp["book_titles"])
    joined = derived.alias("d").join(oltp["fines"].alias("o"), "fineId") \
        .select(F.col("d.fineAmount").alias("got"),
                F.col("o.fineAmount").alias("want"))
    bad = joined.filter(F.abs(F.col("got") - F.col("want")) > 0.0105).count()
    assert bad == 0
    assert derived.filter(F.col("fineAmount").isNull()).count() == 0


def test_payment_amounts_match_generator(oltp):
    nulled = oltp["payments"].withColumn(
        "payAmount",
        F.when(F.col("paymentType") == "Book Sale", F.col("payAmount")))
    derived = R.derive_payment_amounts(nulled, oltp["fines"])
    joined = derived.alias("d").join(oltp["payments"].alias("o"),
                                     "paymentId") \
        .select("d.paymentType", F.col("d.payAmount").alias("got"),
                F.col("o.payAmount").alias("want"))
    bad = joined.filter(F.abs(F.col("got") - F.col("want")) > 0.0105).count()
    assert bad == 0


def test_fine_status_follows_payment(oltp):
    reset = oltp["fines"].withColumn("fineStatus", F.lit("Unpaid"))
    derived = R.apply_fine_payments(reset, oltp["payments"])
    mismatch = derived.alias("d").join(
        oltp["fines"].alias("o"), "fineId").filter(
        F.col("d.fineStatus") != F.col("o.fineStatus")).count()
    assert mismatch == 0


def test_po_totals_match_headers(oltp):
    assert R.po_total_violations(
        oltp["purchase_orders"], oltp["purchase_details"],
        oltp["book_titles"]).count() == 0
    # and a corrupted header is caught
    corrupt = oltp["purchase_orders"].withColumn(
        "totalAmount", F.col("totalAmount") + 5.0)
    n = R.po_total_violations(corrupt, oltp["purchase_details"],
                              oltp["book_titles"]).count()
    assert n == oltp["purchase_orders"].count()


def test_discount_validity_clean(oltp):
    assert R.discount_validity_violations(
        oltp["book_orders"], oltp["discounts"]).count() == 0


def test_sales_amounts_match_generator(oltp):
    stripped = oltp["sales_details"].select(
        "salesId", "orderId", "bookId", "quantitySold")
    derived = R.derive_sales_amounts(stripped, oltp["book_orders"],
                                     oltp["discounts"], oltp["book_titles"])
    joined = derived.alias("d").join(
        oltp["sales_details"].alias("o"), "salesId")
    n = joined.count()
    # HALF_UP (Oracle/our rule) vs Python banker's rounding in the
    # generator: allow one-cent ties, assert they are rare.
    disc_off = joined.filter(
        F.abs(F.col("d.discountAmount") - F.col("o.discountAmount"))
        > 0.0105).count()
    tot_off = joined.filter(
        F.abs(F.col("d.totalAmount") - F.col("o.totalAmount"))
        > 0.0205).count()
    assert disc_off == 0 and tot_off == 0
    exact = joined.filter(
        (F.abs(F.col("d.discountAmount") - F.col("o.discountAmount"))
         < 1e-9)).count()
    assert exact / n > 0.95


def test_cascade_unavailable(spark, oltp):
    dim_book = spark.createDataFrame(
        [Row(bookKey=1, bookId="B0001", bookStatus="UNAVAILABLE",
             title="t", author="a", genre="g", price=1.0, popularity=3.0,
             effective_date=dt.date(2020, 1, 1),
             expiration_date=dt.date(9999, 12, 31), curr_ind="Y")])
    derived = R.cascade_unavailable(oltp["book_copies"], dim_book)
    still = derived.filter((F.col("bookId") == "B0001")
                           & (F.col("bookStatus") != "unavailable")).count()
    assert still == 0
    untouched = derived.filter((F.col("bookId") != "B0001")).count()
    assert untouched == oltp["book_copies"].filter(
        F.col("bookId") != "B0001").count()


def test_derive_all_dependency_order(oltp):
    out = R.derive_all(oltp, AS_OF)
    assert set(out) == set(oltp)
    assert out["fines"].filter(F.col("fineAmount").isNull()).count() == 0
    assert out["payments"].filter(F.col("payAmount").isNull()).count() == 0
