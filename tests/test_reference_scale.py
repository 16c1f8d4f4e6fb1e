"""Reference-scale end-to-end run (marked slow): generate the OLTP
fixtures at the reference's DESIGNED volumes (scale=1.0 — 7,500
members / 9,000 titles / 45,000 copies / 200,000 borrows, BASELINE.md),
run EP2 → EP3 → LQY1-3, and assert the reference's own quick-check
invariants (02_InsertMembers.sql:202-227,
06_InsertBorrowedBooks.sql:178-184). Everything before this ran at
scale≈0.02; this is the proof the plans hold at the volumes the
reference was built for."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.generators.library_data import (
    AS_OF, generate,
)
from library_data_warehouse_and_business_analytics_system_spark.plans.library import (
    initial_load, query1, query2, query3,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def oltp_full(spark):
    return generate(seed=42, scale=1.0).to_spark(spark)


@pytest.fixture(scope="module")
def dw_full(spark, oltp_full):
    out = initial_load(spark, oltp_full, as_of=AS_OF)
    return {k: v.cache() for k, v in out.items()}


def test_reference_volumes(oltp_full):
    """02_InsertMembers.sql:190-227 / 06_InsertBorrowedBooks.sql:25,
    178-184 designed volumes and mix quick-checks."""
    members = oltp_full["members"]
    assert members.count() == 7500
    active_ratio = (members.filter(F.col("memberStatus") == "active").count()
                    / 7500)
    assert 0.70 < active_ratio < 0.80                  # p_active_ratio=0.75
    female_ratio = (members.filter(F.col("memberGender") == "female").count()
                    / 7500)
    assert 0.60 < female_ratio < 0.70                  # 65/35 split

    assert oltp_full["book_titles"].count() == 9000
    assert oltp_full["book_copies"].count() == 45000

    borrows = oltp_full["borrowed_books"]
    assert borrows.count() == 200000
    returned = borrows.filter(F.col("returnStatus") == "Returned").count()
    assert 0.75 < returned / 200000 < 0.95             # ~85% returned
    assert borrows.filter(
        F.datediff("dueDate", "borrowDate") != 10).count() == 0


def test_initial_load_at_scale(dw_full):
    """EP2 at designed volumes: dims complete, facts populated, no
    surrogate-key collisions at 45k-copy / 200k-borrow scale."""
    assert dw_full["dim_date"].count() == 9497
    assert dw_full["dim_members"].count() == 7500
    assert dw_full["dim_book"].count() == 9000

    fb = dw_full["fact_borrowing"]
    n_fb = fb.count()
    assert n_fb > 100_000                              # grain: (date,member,book)
    for dim, key in [("dim_members", "memberKey"), ("dim_book", "bookKey")]:
        d = dw_full[dim]
        assert d.select(key).distinct().count() == d.count()
    # every fact FK resolves (no dangling surrogate keys)
    assert fb.join(dw_full["dim_members"].select("memberKey"),
                   "memberKey", "left_anti").count() == 0
    assert fb.join(dw_full["dim_book"].select("bookKey").distinct(),
                   "bookKey", "left_anti").count() == 0
    assert fb.filter(F.col("overdueDays") < 0).count() == 0


def test_lqy_reports_at_scale(dw_full):
    """LQY1-3 run over the full-volume warehouse and return plausible,
    internally-consistent report shapes."""
    q1 = query1(dw_full, 2019, 2024).cache()
    assert q1.count() > 0
    assert q1.filter(F.col("tot_amt") < 0).count() == 0

    q2 = query2(dw_full, 2019, 2024).cache()
    assert q2.count() > 0

    q3 = query3(dw_full, 2019, 2024).cache()
    assert q3.count() > 0


def test_subsequent_load_at_scale(spark, oltp_full, dw_full):
    """EP3 on top of the full-volume warehouse: a member + title delta
    lands exactly once, facts untouched."""
    from library_data_warehouse_and_business_analytics_system_spark import schema as S
    from library_data_warehouse_and_business_analytics_system_spark.plans.library import (
        incremental as INC,
    )
    new_member = spark.createDataFrame(
        [("M99991", "SCALE NEW", "011-9", "s@b.c", "male", 40,
          "2 Road, Beta Town, Perak, Malaysia", "active",
          dt.date(2024, 6, 1), dt.date(2025, 5, 31))],
        S.OLTP_SCHEMAS["members"])
    new_title = spark.createDataFrame(
        [("B99991", "Scale New Book", "A. Author", "Fiction", 2024,
          8.0, 10.0, 4.0)],
        S.OLTP_SCHEMAS["book_titles"])
    out = INC.subsequent_load(
        spark, dw_full, oltp_full,
        {"members": new_member, "book_titles": new_title}, AS_OF)
    assert out["dim_members"].count() == 7501
    assert out["dim_book"].filter(F.col("bookId") == "B99991").count() == 1
    assert out["fact_borrowing"].count() == dw_full["fact_borrowing"].count()


@pytest.fixture(scope="module")
def duck_dw_full(dw_full):
    """The full-volume Spark-built warehouse registered in DuckDB so
    the reference-SQL translations run on the exact same data."""
    import duckdb

    con = duckdb.connect()
    for name, df in dw_full.items():
        con.register(name + "_pdf", df.toPandas())
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM {name}_pdf")
    yield con
    con.close()


def test_lqy_sweep_at_reference_volumes(dw_full, duck_dw_full):
    """r12 verdict item 3: the 21-tuple seeded parameter sweep vs the
    DuckDB reference translations on the warehouse built at the
    reference's DESIGNED volumes (7.5k members / 9k titles / 45k
    copies / 200k borrows) — until now the sweep only ever ran on the
    scale-0.02 gate fixture. Same shared sweep body, fresh seed."""
    from .lqy_sweep import run_lqy_sweep

    live, total = run_lqy_sweep(dw_full, duck_dw_full, seed=13, rounds=7)
    assert live >= 15, f"only {live}/{total} live tuples at scale=1.0"
