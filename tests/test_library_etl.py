"""Library-domain engine tests: generators honor the reference's
invariants (SURVEY.md §5), the ETL reproduces 05_InitialLoading.sql
semantics, and the three LQY reports match an independent DuckDB
translation of the reference SQL on the same warehouse."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from library_data_warehouse_and_business_analytics_system_spark import schema as S
from library_data_warehouse_and_business_analytics_system_spark.generators.library_data import (
    AS_OF, generate,
)
from library_data_warehouse_and_business_analytics_system_spark.operators.validate import (
    ConstraintError, validate,
)
from library_data_warehouse_and_business_analytics_system_spark.plans.library import (
    initial_load, query1, query2, query3,
)
from library_data_warehouse_and_business_analytics_system_spark.plans.library_gate import (
    FIXTURE_DIR, Q1_SQL, Q2_SQL, Q3_SQL,
)

from .helpers import assert_frames_match


@pytest.fixture(scope="module")
def oltp(spark):
    return generate(seed=42, scale=0.02).to_spark(spark)


@pytest.fixture(scope="module")
def dw(spark, oltp):
    out = initial_load(spark, oltp, as_of=AS_OF)
    return {k: v.cache() for k, v in out.items()}


@pytest.fixture(scope="module")
def duck_dw(dw):
    """The Spark-built warehouse registered in DuckDB, so reference-SQL
    translations can run against the exact same data."""
    con = duckdb.connect()
    for name, df in dw.items():
        con.register(name + "_pdf", df.toPandas())
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM {name}_pdf")
    yield con
    con.close()


# ---------------------------------------------------------------------------
# generator invariants (02_InsertMembers.sql:202-227 quick checks)


def test_generated_tables_pass_check_constraints(oltp):
    for table, rules in S.CHECK_RULES.items():
        validate(oltp[table], rules, table=table)


def test_member_invariants(oltp):
    pdf = oltp["members"].toPandas()
    # status ↔ expiry consistency (02_InsertMembers.sql:211-214)
    active = pdf[pdf.memberStatus == "active"]
    expired = pdf[pdf.memberStatus == "expire"]
    assert (active.expireDate >= AS_OF).all()
    assert (expired.expireDate < AS_OF).all()
    # active ratio ≈ 75% (:205-208), gender split ≈ 65/35 (:224-227)
    assert 0.6 < len(active) / len(pdf) < 0.9
    assert 0.5 < (pdf.memberGender == "female").mean() < 0.8
    assert pdf.memberAge.between(12, 74).all()


def test_borrow_status_mix(oltp):
    pdf = oltp["borrowed_books"].toPandas()
    mix = pdf.returnStatus.value_counts(normalize=True)
    assert mix["Returned"] > 0.7                     # ~85% (:41-53)
    assert (pdf.dueDate - pdf.borrowDate == dt.timedelta(days=10)).all()


def test_po_header_equals_line_sum(oltp):
    """trg_check_purchase_total / trg_guard_po_total
    (02_Trigger.sql:303-379): header total == Σ(qty × purchasePrice)."""
    po = oltp["purchase_orders"].toPandas().set_index("purchaseOrderId")
    pd_ = oltp["purchase_details"].toPandas()
    bt = oltp["book_titles"].toPandas().set_index("bookId")
    pd_["amt"] = pd_.quantity * bt.loc[pd_.bookId].purchasePrice.values
    sums = pd_.groupby("purchaseOrderId").amt.sum().round(2)
    assert (abs(po.totalAmount - sums) < 0.02).all()


def test_validate_rejects_bad_rows(spark):
    bad = spark.createDataFrame(
        [("M0001", "x", "1", "e", "other", 11, "a", "dead",
          dt.date(2020, 1, 1), dt.date(2021, 1, 1))], S.MEMBERS)
    with pytest.raises(ConstraintError) as ei:
        validate(bad, S.CHECK_RULES["members"], table="members")
    assert "ck_members_gender" in str(ei.value)


def test_quarantine_null_predicate_passes_and_partitions_exactly(spark):
    """Oracle CHECK three-valued logic: a NULL predicate PASSES, and
    valid + rejected must be exactly the input (no rows lost when a
    rule evaluates to NULL)."""
    from library_data_warehouse_and_business_analytics_system_spark.operators.validate import (
        quarantine,
    )
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, -5)], "id long, qty int")
    ok, bad = quarantine(df, [("qty_nonneg", "qty >= 0")])
    assert {r.id for r in ok.collect()} == {1, 2}   # NULL passes
    assert {r.id for r in bad.collect()} == {3}


def test_initial_load_quarantines_violating_fixture(spark, oltp):
    """A constraint-violating member must be rejected at the load entry
    point — not silently loaded (02_Trigger.sql:186-192 parity)."""
    bad_member = spark.createDataFrame(
        [("M9999x", "Bad Row", "9", "b@x.com", "other", 200, "addr",
          "dead", dt.date(2020, 1, 1), dt.date(2021, 1, 1))], S.MEMBERS)
    tainted = dict(oltp)
    tainted["members"] = oltp["members"].unionByName(bad_member)
    rejects: dict = {}
    dw = initial_load(spark, tainted, as_of=AS_OF, rejects_out=rejects)
    loaded_ids = {r.memberId for r in
                  dw["dim_members"].select("memberId").collect()}
    assert "M9999x" not in loaded_ids
    assert {r.memberId for r in rejects["members"].collect()} == {"M9999x"}
    with pytest.raises(ConstraintError):
        initial_load(spark, tainted, as_of=AS_OF, validate_mode="strict")


# ---------------------------------------------------------------------------
# ETL semantics (05_InitialLoading.sql)


def test_dim_date_shape_and_attributes(dw):
    dd = dw["dim_date"].toPandas().sort_values("dateKey")
    assert len(dd) == 9497                      # 2000-01-01..2025-12-31
    assert dd.dateKey.iloc[0] == 100001         # seq start (:68)
    assert dd.dateKey.is_monotonic_increasing
    ny = dd[dd.cal_date == dt.date(2024, 1, 1)].iloc[0]
    assert ny.holiday_indicator == "Y" and ny.festive_event == "New Year's Day"
    assert ny.business_day_ind == "N" and ny.cal_quarter == "Q1"
    assert ny.cal_year_quarter == "2024-Q1" and ny.month_name == "JANUARY"
    # weekday flag: 2024-01-06 is a Saturday
    sat = dd[dd.cal_date == dt.date(2024, 1, 6)].iloc[0]
    assert sat.weekday_indicator == "N" and sat.business_day_ind == "N"


def test_dim_members_standardization(dw, oltp):
    dm = dw["dim_members"].toPandas()
    src = oltp["members"].toPandas().set_index("memberId")
    assert dm.memberKey.min() == 100001
    assert set(dm.memberGender) <= {"F", "M", "U"}
    assert (dm.memberName == dm.memberName.str.upper()).all()
    # address parse: state=2nd-last part, city=3rd-last (:256-277)
    row = dm.iloc[0]
    parts = [p.strip() for p in src.loc[row.memberId].memberAddress.split(",")]
    assert row.state == parts[-2].upper()
    assert row.city == parts[-3].upper()
    assert row["MemberDuration"].endswith(" years")


def test_dim_book_standardization(dw):
    db = dw["dim_book"].toPandas()
    assert (db.genre == db.genre.str.upper()).all()
    assert (db.price >= 0).all()
    assert db.popularity.notna().all()
    assert (db.curr_ind == "Y").all()


def test_fact_sales_measures(dw, oltp):
    fs = dw["fact_sales"].toPandas()
    sd = oltp["sales_details"].toPandas()
    assert len(fs) == len(sd)                   # one row per sales line
    assert (fs.line_total >= 0).all()
    assert (fs.discount >= 0).all()
    assert (fs.quantity >= 1).all()
    assert set(fs.discount_desc.unique()) != set()


def test_fact_borrowing_measures(dw):
    fb = dw["fact_borrowing"].toPandas()
    assert (fb.overdueDays >= 0).all()
    assert (fb.borrowDuration >= 0).all()
    assert fb.returnRate.between(0, 100).all()
    # PK grain holds after dedup
    assert not fb.duplicated(["dateKey", "memberKey", "bookKey"]).any()


def test_fact_purchase_measures(dw, oltp):
    fp = dw["fact_purchase"].toPandas()
    assert (fp.totalAmount >= 0).all()
    assert set(fp.flag_ind) <= {"Y", "N"}
    # grain: one row per (date, book, supplier, PO)
    assert not fp.duplicated(
        ["dateKey", "bookKey", "supplierKey", "purchaseOrderId"]).any()


# ---------------------------------------------------------------------------
# LQY reports vs independent DuckDB translation on the same warehouse.
# The SQL templates live in plans/library_gate.py, shared with the
# driver-gate registrations, so pytest and the gate can never diverge.



def test_query1_matches_reference_sql(dw, duck_dw):
    got = query1(dw, 2018, 2022, limit=5, gender="ALL").toPandas()
    exp = duck_dw.execute(Q1_SQL.format(yf=2018, yt=2022, g="ALL", lim=5)).df()
    assert len(got) > 0
    assert_frames_match(got, exp, "query1", float_rtol=1e-9)


def test_query1_gender_filter(dw, duck_dw):
    got = query1(dw, 2019, 2021, limit=3, gender="F").toPandas()
    exp = duck_dw.execute(Q1_SQL.format(yf=2019, yt=2021, g="F", lim=3)).df()
    assert len(got) > 0
    assert_frames_match(got, exp, "query1_f", float_rtol=1e-9)




def test_query3_matches_reference_sql(dw, duck_dw):
    got = query3(dw, 2016, 2020, states_csv="%", target_gm_pct=15.0).toPandas()
    exp = duck_dw.execute(
        Q3_SQL.format(yf=2016, yt=2020, cov=15, sp="1=1")).df()
    assert len(got) > 0
    assert_frames_match(got, exp, "query3", float_rtol=1e-9)


def test_query3_state_csv_filter(dw, duck_dw):
    """P7 multi-value parameter branch (LQY_query3.txt:72-75): the
    comma-split state list filters before aggregation; mixed-case
    input normalizes like the reference."""
    got = query3(dw, 2016, 2020, states_csv="Perlis,Selangor,Kedah",
                 target_gm_pct=15.0).toPandas()
    exp = duck_dw.execute(Q3_SQL.format(
        yf=2016, yt=2020, cov=15,
        sp="state IN ('PERLIS','SELANGOR','KEDAH')")).df()
    assert len(got) > 0
    assert set(got.state) <= {"PERLIS", "SELANGOR", "KEDAH"}
    assert_frames_match(got, exp, "query3_states", float_rtol=1e-9)


def test_query2_matches_reference_sql(dw, duck_dw):
    got = query2(dw, 2017, 2020, topn=5).toPandas()
    exp = duck_dw.execute(
        Q2_SQL.format(yf=2017, yt=2020, topn=5, sup="1=1")).df()
    assert len(got) > 0
    assert_frames_match(got, exp, "query2", float_rtol=1e-9)


def test_query2_supplier_csv_filter(dw, duck_dw):
    """P7 multi-value supplier filter (LQY_query2.txt:58-62,81):
    purchase lines restrict to the listed suppliers before PO and
    primary-genre attribution; mixed-case input normalizes."""
    got = query2(dw, 2017, 2020, topn=5,
                 suppliers_csv="Supplier Lim Sdn Bhd,"
                               "Supplier Wong Sdn Bhd,"
                               "Supplier Kumar Sdn Bhd").toPandas()
    exp = duck_dw.execute(Q2_SQL.format(
        yf=2017, yt=2020, topn=5,
        sup="UPPER(s.supplierName) IN ('SUPPLIER LIM SDN BHD',"
            "'SUPPLIER WONG SDN BHD','SUPPLIER KUMAR SDN BHD')")).df()
    assert len(got) > 0
    assert_frames_match(got, exp, "query2_suppliers", float_rtol=1e-9)


def test_query2_runs_and_is_sane(dw):
    got = query2(dw, 2017, 2020, topn=5).toPandas()
    assert len(got) > 0
    assert (got.spend >= 0).all()
    # top-N per (year, quarter) respected
    assert got.groupby(["year", "quarter"]).size().max() <= 5
    # AOV = spend / po_cnt where po_cnt > 0
    nz = got[got.po_cnt_qtr > 0]
    assert (abs(nz.aov - (nz.spend / nz.po_cnt_qtr).round(2)) < 0.02).all()


# ---------------------------------------------------------------------------
# Committed fixture warehouse (fixtures/library_dw) — the LQY driver
# gate reads it from disk, so it must stay in lockstep with the live
# generator + ETL. If this fails after an intentional ETL change,
# rerun scripts/build_fixture_warehouse.py and commit the result.


def test_committed_fixture_matches_live_etl(spark, dw):
    for name, live in dw.items():
        stored = spark.read.parquet(str(FIXTURE_DIR / f"{name}.parquet"))
        assert_frames_match(stored.toPandas(), live.toPandas(),
                            f"fixture:{name}")


@pytest.mark.slow  # opt-in lane (r14): long single test
def test_lqy_parameter_sweep(dw, duck_dw):
    """r11 verdict item 6: the three LQY gates pin 2 parameter tuples
    each; this sweep pushes 21 seeded (year_from, year_to, limit /
    topn / cov, gender / suppliers / states) tuples through
    query1/2/3 vs the DuckDB reference translations on the SAME
    warehouse — closing the "right answer only at the gated
    parameters" residual risk. Tuples where both engines return zero
    rows are counted separately; at least 15 must be live. (Sweep
    body shared with the reference-volume run — tests/lqy_sweep.py.)"""
    from .lqy_sweep import run_lqy_sweep

    live, total = run_lqy_sweep(dw, duck_dw, seed=1212, rounds=7)
    assert live >= 15, f"only {live}/{total} live tuples — widen the ranges"
