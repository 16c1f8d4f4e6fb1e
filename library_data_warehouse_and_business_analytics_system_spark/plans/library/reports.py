"""The three parameterized OLAP reports (EP1, SURVEY.md §3):
Spark re-expressions of /root/reference/LQY_query{1,2,3}.txt.

Each CTE of the reference becomes a named DataFrame; the SQL*Plus
presentation layer (TTITLE/COLUMN/BREAK/COMPUTE) is out of engine
scope — subtotal rows are available via ``.rollup`` on the result.

All three keep the reference's widen-then-clip pattern: scan
``[year_from−1, year_to]`` so LAG sees the prior period, then clip the
output to ``[year_from, year_to]`` (LQY_query1.txt:50,96). On
year-partitioned facts that widened predicate IS the partition-pruning
filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ...functions.scalars import state_norm


def _csv_upper_list(csv: str) -> list[str]:
    return [s.strip().upper() for s in csv.split(",") if s.strip()]


def _dec_sum(col: str):
    """SQL*Plus COMPUTE sums the DISPLAYED rows. The displayed money
    columns are doubles that originated as DECIMAL(18,4) (fixture
    magnitudes ~1e7 with 4dp = ≤12 significant digits, well inside a
    double's 15), so re-casting to decimal recovers the exact printed
    value and the subtotal is an exact, order-independent decimal sum
    on both engines — no float-summation-order hazard in the gate."""
    return (F.sum(F.col(col).cast("decimal(18,4)"))
            .cast("double").alias(col))


def _qnum_of(quarter_col: str):
    return F.substring(quarter_col, 2, 1).cast("int")


# ---------------------------------------------------------------------------
# Query 1 — Quarterly Analysis of Highest-Performing Sales Genres
# (LQY_query1.txt:39-111)


def query1(dw: dict[str, DataFrame], year_from: int, year_to: int,
           limit: int = 5, gender: str = "ALL") -> DataFrame:
    fs, dd, db, dm = (dw["fact_sales"], dw["dim_date"], dw["dim_book"],
                      dw["dim_members"])

    # sales_q (:39-53)
    sales = (
        fs.join(F.broadcast(dd.select("dateKey", "cal_year", "cal_quarter")),
                "dateKey")
        .join(F.broadcast(db.select("bookKey", "genre")), "bookKey")
        .join(F.broadcast(dm.select("memberKey", "memberGender")), "memberKey")
        .filter(F.col("cal_year").between(year_from - 1, year_to))
    )
    if gender.upper() != "ALL":
        sales = sales.filter(F.upper("memberGender") == gender.upper())
    sales_q = (
        sales.groupBy(F.col("cal_year").alias("year"),
                      F.col("cal_quarter").alias("qtr"), "genre")
        .agg(F.sum(F.col("line_total").cast("decimal(18,4)")).alias("amount"),
             F.sum("quantity").alias("qty"))
    )

    # genre_year: quarter pivot (:54-65)
    def qamt(q: str):
        return F.sum(F.when(F.col("qtr") == q, F.col("amount"))
                     .otherwise(F.lit(0).cast("decimal(18,4)"))).alias(f"{q.lower()}_amt")

    genre_year = (
        sales_q.groupBy("year", "genre")
        .agg(qamt("Q1"), qamt("Q2"), qamt("Q3"), qamt("Q4"),
             F.sum("qty").alias("tot_qty"), F.sum("amount").alias("tot_amt"))
    )

    # genre_metrics: QoQ percentages + LAG (:66-82)
    def pct(a: str, b: str):
        # CASE WHEN a=0 → NULL ELSE ROUND((b-a)/a*100, 1)
        return F.when(F.col(a) == 0, F.lit(None)).otherwise(
            F.round((F.col(b) - F.col(a)) / F.nullif(F.col(a), F.lit(0))
                    * 100, 1)
        )

    wg = Window.partitionBy("genre").orderBy("year")
    metrics = (
        genre_year
        .withColumn("pct_q1_q2", pct("q1_amt", "q2_amt"))
        .withColumn("pct_q2_q3", pct("q2_amt", "q3_amt"))
        .withColumn("pct_q3_q4", pct("q3_amt", "q4_amt"))
        .withColumn("prev_qty", F.lag("tot_qty").over(wg))
        .withColumn("prev_amt", F.lag("tot_amt").over(wg))
    )

    # ranked (:83-97): clip years, diff %, ROW_NUMBER per year
    def diff_pct(cur: str, prev: str):
        return (
            F.when(F.col(prev).isNull() | (F.col(prev) == 0), F.lit(0.0))
            .otherwise(F.round((F.col(cur) - F.col(prev)) / F.col(prev) * 100, 1))
        )

    wy = Window.partitionBy("year").orderBy(
        F.coalesce(F.col("tot_amt"), F.lit(0)).desc())
    ranked = (
        metrics.filter(F.col("year").between(year_from, year_to))
        .withColumn("qty_diff_pct", diff_pct("tot_qty", "prev_qty"))
        .withColumn("amt_diff_pct", diff_pct("tot_amt", "prev_amt"))
        .withColumn("rn", F.row_number().over(wy))
    )

    # final select (:98-111)
    z = F.lit(0).cast("decimal(18,4)")
    return (
        ranked.filter(F.col("rn") <= limit)
        .select(
            "year", "genre",
            F.coalesce("q1_amt", z).cast("double").alias("q1_amt"),
            F.coalesce("q2_amt", z).cast("double").alias("q2_amt"),
            F.coalesce("q3_amt", z).cast("double").alias("q3_amt"),
            F.coalesce("q4_amt", z).cast("double").alias("q4_amt"),
            F.col("pct_q1_q2").cast("double").alias("pct_q1_q2"),
            F.col("pct_q2_q3").cast("double").alias("pct_q2_q3"),
            F.col("pct_q3_q4").cast("double").alias("pct_q3_q4"),
            F.coalesce("tot_qty", F.lit(0)).cast("long").alias("tot_qty"),
            F.col("qty_diff_pct").cast("double").alias("qty_diff_pct"),
            F.coalesce("tot_amt", z).cast("double").alias("tot_amt"),
            F.col("amt_diff_pct").cast("double").alias("amt_diff_pct"),
        )
        .orderBy("year", F.col("tot_amt").desc(), "genre")
    )


# ---------------------------------------------------------------------------
# Query 2 — Quarterly Purchase Spend And Orders by Genre
# (LQY_query2.txt:57-215)


def query2(dw: dict[str, DataFrame], year_from: int, year_to: int,
           topn: int = 11, suppliers_csv: str = "%") -> DataFrame:
    fp, dd, db, ds = (dw["fact_purchase"], dw["dim_date"], dw["dim_book"],
                      dw["dim_suppliers"])

    # p_lines (:66-82), widened one year back
    lines = (
        fp.join(F.broadcast(dd.select("dateKey", "cal_year", "cal_quarter")),
                "dateKey")
        .join(F.broadcast(db.select("bookKey", "genre")), "bookKey")
        .join(F.broadcast(ds.select("supplierKey", "supplierName")),
              "supplierKey")
        .filter(F.col("cal_year").between(year_from - 1, year_to))
    )
    if suppliers_csv != "%":
        lines = lines.filter(
            F.upper("supplierName").isin(_csv_upper_list(suppliers_csv)))
    lines = lines.select(
        F.col("cal_year").alias("year"), F.col("cal_quarter").alias("quarter"),
        F.substring("cal_quarter", 2, 1).cast("int").alias("qnum"),
        "genre", F.col("purchaseOrderId").alias("po_id"),
        F.col("quantity").alias("line_qty"),
        F.col("totalAmount").cast("decimal(18,4)").alias("line_amt"),
    )

    # po_tot (:85-92) and po_genre_share (:95-102). ONE evaluation of
    # the fact join feeds both (r13 s3, guide §2.4): po_tot is the
    # per-PO re-aggregation OF share — decimal sums are associative
    # and exact, so sum-of-genre-sums ≡ sum-of-lines bit for bit (and
    # long quantities trivially so) — where the previous shape ran
    # the lines join twice and shuffled the raw lines for both
    # groupings. The re-aggregation's input is the already-reduced
    # share rows, not the fact.
    share = lines.groupBy("year", "quarter", "qnum", "po_id", "genre").agg(
        F.sum("line_amt").alias("g_amt"), F.sum("line_qty").alias("g_qty"))
    po_tot = share.groupBy("year", "quarter", "qnum", "po_id").agg(
        F.sum("g_amt").alias("po_amt"), F.sum("g_qty").alias("po_qty"))

    # po_primary_genre (:105-117): max-amount genre per PO, alphabetic ties
    wpo = Window.partitionBy("year", "quarter", "qnum", "po_id").orderBy(
        F.col("g_amt").desc(), F.col("genre").asc())
    primary = (share.withColumn("rn", F.row_number().over(wpo))
               .filter(F.col("rn") == 1)
               .select("year", "quarter", "qnum", "po_id", "genre"))

    # genre_partitioned (:120-130)
    partitioned = (
        primary.join(po_tot, ["year", "quarter", "qnum", "po_id"])
        .groupBy("year", "quarter", "qnum", "genre")
        .agg(F.countDistinct("po_id").alias("po_cnt"),
             F.sum("po_amt").alias("spend"),
             F.sum("po_qty").alias("qty_pur"))
    )

    # universe = quarters-present × all genres (:133-151). The quarter
    # set comes from share's grouping keys, not a THIRD evaluation of
    # the fact join (r13 s3): share keeps one row per (y, q, qn, po,
    # genre) present in lines, so distinct (y, q, qn) is identical.
    qtrs = (share.filter(F.col("year").between(year_from, year_to))
            .select("year", "quarter", "qnum").distinct())
    genres = db.filter(F.col("genre").isNotNull()).select("genre").distinct()
    universe = qtrs.crossJoin(F.broadcast(genres))

    filled = (
        universe.join(partitioned, ["year", "quarter", "qnum", "genre"], "left")
        .select("year", "quarter", "qnum", "genre",
                F.coalesce("spend", F.lit(0).cast("decimal(18,4)")).alias("spend"),
                F.coalesce("qty_pur", F.lit(0)).alias("qty_pur"),
                F.coalesce("po_cnt", F.lit(0)).alias("po_cnt"))
    )

    # ranked / keep_rows (:165-177)
    wq = Window.partitionBy("year", "quarter").orderBy(
        F.col("spend").desc(), F.col("genre").asc())
    kept = filled.withColumn("rn", F.row_number().over(wq)) \
        .filter(F.col("rn") <= topn)

    # trend + final (:183-207)
    wg = Window.partitionBy("genre").orderBy("year", "qnum")
    trend = (
        kept
        .withColumn("po_cnt_qtr", F.col("po_cnt"))
        .withColumn("aov", F.when(F.coalesce("po_cnt", F.lit(0)) == 0, None)
                    .otherwise(F.round(F.col("spend") / F.col("po_cnt"), 2)))
        .withColumn("prev_spend", F.lag("spend").over(wg))
    )
    pct_qoq = F.coalesce(
        F.when((F.col("year") == year_from) & (F.col("qnum") == 1), F.lit(0.0))
        .when(F.col("prev_spend").isNull() | (F.col("prev_spend") == 0),
              F.lit(0.0))
        .otherwise(F.round((F.col("spend") - F.col("prev_spend"))
                           / F.nullif(F.col("prev_spend"), F.lit(0)) * 100, 2))
        .cast("double"),
        F.lit(0.0))

    return (
        trend.select(
            "year", "quarter", "genre",
            F.coalesce("spend", F.lit(0).cast("decimal(18,4)"))
            .cast("double").alias("spend"),
            pct_qoq.alias("pct_qoq"),
            F.coalesce("po_cnt_qtr", F.lit(0)).cast("long").alias("po_cnt_qtr"),
            F.coalesce(F.col("aov").cast("double"), F.lit(0.0)).alias("aov"),
            F.coalesce("qty_pur", F.lit(0)).cast("long").alias("qty_pur"),
            "qnum",
        )
        .filter(F.col("year").between(year_from, year_to))
        .filter(~((F.col("spend") == 0) & (F.col("qty_pur") == 0)
                  & (F.col("po_cnt_qtr") == 0)))
        .orderBy("year", "qnum", F.col("spend").desc())
        .drop("qnum")
    )


# ---------------------------------------------------------------------------
# Query 3 — Quarterly Gross Margin by Member State
# (LQY_query3.txt:62-135)


def query3(dw: dict[str, DataFrame], year_from: int, year_to: int,
           states_csv: str = "%", target_gm_pct: float = 15.0) -> DataFrame:
    fs, dd, db, dm = (dw["fact_sales"], dw["dim_date"], dw["dim_book"],
                      dw["dim_members"])

    joined = (
        fs.join(F.broadcast(dd.select("dateKey", "cal_year", "cal_quarter")),
                "dateKey")
        .join(F.broadcast(db.select("bookKey", "price")), "bookKey")
        .join(F.broadcast(dm.select("memberKey", "state")), "memberKey")
        .filter(F.col("cal_year").between(year_from, year_to))
        .withColumn("state_n", state_norm(F.col("state")))
    )
    if states_csv != "%":
        joined = joined.filter(F.col("state_n").isin(_csv_upper_list(states_csv)))

    # sales_state (:78-94): cost model = qty × 0.8 × price (:85)
    cost = (F.col("quantity").cast("decimal(18,4)")
            * (F.lit(0.8).cast("decimal(8,4)")
               * F.coalesce(F.col("price"), F.lit(0)).cast("decimal(18,4)")))
    agg = (
        joined.groupBy(F.col("cal_year").alias("year"),
                       F.col("cal_quarter").alias("quarter"),
                       F.substring("cal_quarter", 2, 1).cast("int").alias("qnum"),
                       F.col("state_n").alias("state"))
        .agg(F.sum(F.col("line_total").cast("decimal(18,4)")).alias("total_revenue"),
             F.sum(cost).alias("total_cost"))
        .withColumn("total_gm", F.col("total_revenue") - F.col("total_cost"))
    )

    gm_pct = F.when(F.col("total_revenue") == 0, F.lit(None)).otherwise(
        F.round(F.col("total_gm") / F.nullif(F.col("total_revenue"), F.lit(0))
                * 100, 2))
    ws = Window.partitionBy("state").orderBy("year", "qnum")
    with_qoq = (
        agg.withColumn("total_gm_pct", gm_pct.cast("double"))
        .withColumn("gm_pct_qoq",
                    F.round(F.col("total_gm_pct")
                            - F.lag("total_gm_pct").over(ws), 2))
    )
    signal = (
        F.when(F.coalesce("total_gm_pct", F.lit(0.0)) >= target_gm_pct,
               "Meets Target")
        .when(F.coalesce("total_gm_pct", F.lit(0.0)) >= target_gm_pct - 3,
              "Near Target")
        .otherwise("Below Target")
    )
    return (
        with_qoq.select(
            "year", "quarter", "state",
            F.col("total_revenue").cast("double").alias("total_revenue"),
            F.col("total_cost").cast("double").alias("total_cost"),
            F.col("total_gm").cast("double").alias("total_gm"),
            "total_gm_pct",
            F.coalesce(F.col("gm_pct_qoq").cast("double"), F.lit(0.0))
            .alias("gm_pct_qoq"),
            signal.alias("signal"),
            "qnum",
        )
        .orderBy("year", "qnum", "state")
        .drop("qnum")
    )


# ---------------------------------------------------------------------------
# SQL*Plus COMPUTE subtotal variants (r8 verdict item 6). The
# reference reports print per-break subtotal lines via the SQL*Plus
# presentation layer:
#   LQY_query1.txt:36-37  BREAK ON year;
#                         COMPUTE SUM OF q1..q4_amt tot_qty tot_amt ON year
#   LQY_query2.txt:53-54  BREAK ON year, quarter;
#                         COMPUTE SUM OF spend qty_pur po_cnt_qtr ON year quarter
#   LQY_query3.txt:59-60  BREAK ON year, quarter;
#                         COMPUTE SUM OF total_revenue total_cost total_gm
#                                 ON quarter year
# These variants emit the same report WITH those rows: detail rows
# tagged row_kind='detail', one 'total' row per year (q1) / one
# 'qtr_total' per (year, quarter) plus one 'year_total' per year
# (q2, q3), non-summed columns NULL exactly as SQL*Plus leaves them
# blank. The two-level variants are ONE `.rollup` pass over the
# (tiny, already top-N-clipped) report output — grouping-sets
# semantics (A9), not two scans.


def query1_subtotals(dw: dict[str, DataFrame], year_from: int, year_to: int,
                     limit: int = 5, gender: str = "ALL") -> DataFrame:
    detail = query1(dw, year_from, year_to, limit, gender)
    nd = F.lit(None).cast("double")
    totals = (
        detail.groupBy("year")
        .agg(_dec_sum("q1_amt"), _dec_sum("q2_amt"), _dec_sum("q3_amt"),
             _dec_sum("q4_amt"),
             F.sum("tot_qty").cast("long").alias("tot_qty"),
             _dec_sum("tot_amt"))
        .select("year", F.lit(None).cast("string").alias("genre"),
                "q1_amt", "q2_amt", "q3_amt", "q4_amt",
                nd.alias("pct_q1_q2"), nd.alias("pct_q2_q3"),
                nd.alias("pct_q3_q4"), "tot_qty",
                nd.alias("qty_diff_pct"), "tot_amt",
                nd.alias("amt_diff_pct"))
    )
    return (
        detail.withColumn("row_kind", F.lit("detail"))
        .unionByName(totals.withColumn("row_kind", F.lit("total")))
        # 'detail' < 'total' sorts the year's detail block first
        .orderBy("year", "row_kind", F.col("tot_amt").desc(), "genre")
    )


def query2_subtotals(dw: dict[str, DataFrame], year_from: int, year_to: int,
                     topn: int = 11, suppliers_csv: str = "%") -> DataFrame:
    detail = query2(dw, year_from, year_to, topn, suppliers_csv)
    nd = F.lit(None).cast("double")
    gid = F.grouping_id()
    totals = (
        detail.withColumn("qnum", _qnum_of("quarter"))
        .rollup("year", "qnum")
        .agg(F.sum(F.col("spend").cast("decimal(18,4)")).alias("_spend"),
             F.sum("po_cnt_qtr").alias("_po"),
             F.sum("qty_pur").alias("_qty"),
             gid.alias("_gid"))
        .filter(F.col("_gid").isin(0, 1))  # (year,qnum) + (year); no grand
        .select(
            "year",
            F.when(F.col("_gid") == 0,
                   F.concat(F.lit("Q"), F.col("qnum"))).alias("quarter"),
            F.lit(None).cast("string").alias("genre"),
            F.col("_spend").cast("double").alias("spend"),
            nd.alias("pct_qoq"),
            F.col("_po").cast("long").alias("po_cnt_qtr"),
            nd.alias("aov"),
            F.col("_qty").cast("long").alias("qty_pur"),
            F.when(F.col("_gid") == 0, F.lit("qtr_total"))
            .otherwise(F.lit("year_total")).alias("row_kind"))
    )
    out = detail.withColumn("row_kind", F.lit("detail")).unionByName(totals)
    # detail < qtr_total < year_total alphabetically; year totals sort
    # after Q4 via the NULL-quarter → 9 key.
    return out.orderBy(
        "year", F.coalesce(_qnum_of("quarter"), F.lit(9)), "row_kind",
        F.col("spend").desc(), "genre")


def query3_subtotals(dw: dict[str, DataFrame], year_from: int, year_to: int,
                     states_csv: str = "%",
                     target_gm_pct: float = 15.0) -> DataFrame:
    detail = query3(dw, year_from, year_to, states_csv, target_gm_pct)
    nd = F.lit(None).cast("double")
    gid = F.grouping_id()
    totals = (
        detail.withColumn("qnum", _qnum_of("quarter"))
        .rollup("year", "qnum")
        .agg(F.sum(F.col("total_revenue").cast("decimal(18,4)")).alias("_r"),
             F.sum(F.col("total_cost").cast("decimal(18,4)")).alias("_c"),
             F.sum(F.col("total_gm").cast("decimal(18,4)")).alias("_g"),
             gid.alias("_gid"))
        .filter(F.col("_gid").isin(0, 1))
        .select(
            "year",
            F.when(F.col("_gid") == 0,
                   F.concat(F.lit("Q"), F.col("qnum"))).alias("quarter"),
            F.lit(None).cast("string").alias("state"),
            F.col("_r").cast("double").alias("total_revenue"),
            F.col("_c").cast("double").alias("total_cost"),
            F.col("_g").cast("double").alias("total_gm"),
            nd.alias("total_gm_pct"), nd.alias("gm_pct_qoq"),
            F.lit(None).cast("string").alias("signal"),
            F.when(F.col("_gid") == 0, F.lit("qtr_total"))
            .otherwise(F.lit("year_total")).alias("row_kind"))
    )
    out = detail.withColumn("row_kind", F.lit("detail")).unionByName(totals)
    return out.orderBy(
        "year", F.coalesce(_qnum_of("quarter"), F.lit(9)), "row_kind",
        "state")
