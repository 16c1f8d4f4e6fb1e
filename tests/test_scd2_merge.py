"""SCD Type-2 and MERGE operator tests, reproducing the transition
matrix of Prod_Update_DimBook (06_Type2_DimBook.sql:22-113) and
Prod_Update_DimMembers_T2 (06_Type2_DimMembers.sql:4-117)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.merge import (
    insert_not_exists, merge_upsert,
)
from library_data_warehouse_and_business_analytics_system_spark.operators.scd2 import (
    OPEN_END, scd2_apply,
)

DIM_SCHEMA = ("bookKey long, bookId string, price double, bookStatus string, "
              "title string, effective_date date, expiration_date date, "
              "curr_ind string")


@pytest.fixture()
def dim(spark):
    rows = [
        (100001, "B0001", 50.0, "AVAILABLE", "T1",
         dt.date(2020, 1, 1), OPEN_END, "Y"),
        (100002, "B0002", 60.0, "AVAILABLE", "T2",
         dt.date(2020, 1, 1), OPEN_END, "Y"),
        # B0003 already has history: one expired + one current version
        (100003, "B0003", 10.0, "AVAILABLE", "T3",
         dt.date(2020, 1, 1), dt.date(2021, 12, 31), "N"),
        (100004, "B0003", 12.0, "AVAILABLE", "T3",
         dt.date(2022, 1, 1), OPEN_END, "Y"),
    ]
    return spark.createDataFrame(rows, DIM_SCHEMA)


def test_scd2_change_expires_and_inserts(spark, dim):
    updates = spark.createDataFrame(
        [("B0001", 55.0, "AVAILABLE", "T1")],
        "bookId string, price double, bookStatus string, title string")
    eff = dt.date(2023, 6, 15)
    out = scd2_apply(dim, updates, "bookId", ["price", "bookStatus"],
                     "bookKey", eff, carried=["title"]).toPandas()
    b1 = out[out.bookId == "B0001"].sort_values("effective_date")
    assert len(b1) == 2
    old, new = b1.iloc[0], b1.iloc[1]
    # expire-and-insert: old closes the day before (06_Type2_DimBook.sql:55)
    assert old.curr_ind == "N"
    assert old.expiration_date == dt.date(2023, 6, 14)
    assert new.curr_ind == "Y"
    assert new.price == 55.0 and new.title == "T1"
    assert new.effective_date == eff and new.expiration_date == OPEN_END
    # surrogate keys continue after current max
    assert new.bookKey > 100004


def test_scd2_unchanged_rows_untouched(spark, dim):
    updates = spark.createDataFrame(
        [("B0002", 60.0, "AVAILABLE", "T2")],
        "bookId string, price double, bookStatus string, title string")
    out = scd2_apply(dim, updates, "bookId", ["price", "bookStatus"],
                     "bookKey", dt.date(2023, 6, 15), carried=["title"]).toPandas()
    assert len(out) == 4                      # no new versions
    b2 = out[out.bookId == "B0002"].iloc[0]
    assert b2.curr_ind == "Y" and b2.expiration_date == OPEN_END


def test_scd2_new_key_inserts_first_version(spark, dim):
    updates = spark.createDataFrame(
        [("B0099", 20.0, "AVAILABLE", "T99")],
        "bookId string, price double, bookStatus string, title string")
    out = scd2_apply(dim, updates, "bookId", ["price", "bookStatus"],
                     "bookKey", dt.date(2023, 1, 1), carried=["title"]).toPandas()
    b99 = out[out.bookId == "B0099"]
    assert len(b99) == 1
    assert b99.iloc[0].curr_ind == "Y"
    assert b99.iloc[0].effective_date == dt.date(2023, 1, 1)


def test_scd2_close_only_branch(spark, dim):
    """Inactive member → expire current with NO successor
    (06_Type2_DimMembers.sql:101-107)."""
    updates = spark.createDataFrame(
        [("B0002", 60.0, "AVAILABLE", "T2", True)],
        "bookId string, price double, bookStatus string, title string, "
        "inactive boolean")
    out = scd2_apply(dim, updates, "bookId", ["price", "bookStatus"],
                     "bookKey", dt.date(2023, 6, 15), carried=["title"],
                     close_only_flag="inactive").toPandas()
    b2 = out[out.bookId == "B0002"]
    assert len(b2) == 1
    assert b2.iloc[0].curr_ind == "N"
    assert b2.iloc[0].expiration_date == dt.date(2023, 6, 14)


def test_scd2_expiration_never_precedes_effective(spark):
    """GREATEST(yesterday, effective_date) guard
    (06_Type2_DimMembers.sql:73): same-day change must not produce an
    expiration before the row's own effective date."""
    dim = spark.createDataFrame(
        [(100001, "B0001", 50.0, "AVAILABLE", "T1",
          dt.date(2023, 6, 15), OPEN_END, "Y")], DIM_SCHEMA)
    updates = spark.createDataFrame(
        [("B0001", 99.0, "AVAILABLE", "T1")],
        "bookId string, price double, bookStatus string, title string")
    out = scd2_apply(dim, updates, "bookId", ["price", "bookStatus"],
                     "bookKey", dt.date(2023, 6, 15), carried=["title"]).toPandas()
    old = out[(out.bookId == "B0001") & (out.curr_ind == "N")].iloc[0]
    assert old.expiration_date >= old.effective_date


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [("PO0001", 10.0, "Pending"), ("PO0002", 20.0, "Received")],
        "purchaseOrderId string, totalAmount double, orderStatus string")
    source = spark.createDataFrame(
        [("PO0002", 25.0, "Received"), ("PO0003", 30.0, "Pending")],
        "purchaseOrderId string, totalAmount double, orderStatus string")
    out = merge_upsert(target, source, ["purchaseOrderId"]).toPandas() \
        .set_index("purchaseOrderId").sort_index()
    assert len(out) == 3
    assert out.loc["PO0001"].totalAmount == 10.0   # untouched
    assert out.loc["PO0002"].totalAmount == 25.0   # updated
    assert out.loc["PO0003"].totalAmount == 30.0   # inserted


def test_insert_not_exists_is_idempotent(spark):
    target = spark.createDataFrame([(1, "a")], "k long, v string")
    source = spark.createDataFrame([(1, "x"), (2, "b"), (2, "dup")],
                                   "k long, v string")
    out = insert_not_exists(target, source, ["k"])
    pdf = out.toPandas().set_index("k").sort_index()
    assert len(pdf) == 2
    assert pdf.loc[1].v == "a"        # existing row wins (NOT EXISTS)
    # re-applying adds nothing (07_SubsequentLoading.sql idempotency)
    again = insert_not_exists(out, source, ["k"]).toPandas()
    assert len(again) == 2


def test_merge_upsert_with_null_keys(spark):
    """A legitimately-NULL merge key must not be misread as
    'unmatched' noise: NULL keys never match each other (SQL MERGE
    semantics), so a NULL-key target row survives untouched and a
    NULL-key source row inserts — regression for the presence-marker
    fix (match was previously inferred from keys[0] null-ness)."""
    target = spark.createDataFrame(
        [(None, 1.0), ("K1", 2.0)], "k string, v double")
    source = spark.createDataFrame(
        [(None, 9.0), ("K1", 5.0)], "k string, v double")
    out = merge_upsert(target, source, ["k"]).toPandas()
    by_v = sorted(out.v.tolist())
    assert by_v == [1.0, 5.0, 9.0]      # NULL-target kept, K1 updated,
    assert len(out) == 3                # NULL-source inserted


def test_delta_merge_path_gated_by_import(spark, tmp_path):
    """The Delta-native MERGE path must be selected ONLY when
    delta-spark is importable: in this container it is not, so
    HAS_DELTA is False and merge_upsert_delta refuses with a clear
    pointer at the emulation (which the differentials above verify)."""
    from library_data_warehouse_and_business_analytics_system_spark.operators import merge as m

    assert m.HAS_DELTA is False
    src = spark.createDataFrame([("K1", 1.0)], "k string, v double")
    with pytest.raises(RuntimeError, match="delta-spark is not installed"):
        m.merge_upsert_delta(spark, str(tmp_path), src, ["k"])
