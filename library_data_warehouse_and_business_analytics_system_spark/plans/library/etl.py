"""Initial warehouse load (EP2, SURVEY.md §3): the Spark re-expression
of /root/reference/05_InitialLoading.sql.

Each loader is a pure DataFrame transform: OLTP DataFrames in, DW
DataFrames out. The PL/SQL row-at-a-time loops become set-based plans
(the date spine's per-row holiday subqueries become one broadcast left
join; the per-row sequence NEXTVAL becomes a window-ranked surrogate
key). All SYSDATE-dependent measures take an explicit ``as_of`` date
(SURVEY.md §7 risk 1).

Scale notes: dims are small → broadcast into fact loads; facts carry a
``cal_year``-prefixed dateKey so year-range predicates prune partitions
when facts are written partitioned by year.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ...functions import scalars as X
from ...operators import validate as V
from ...operators.surrogate import with_surrogate_key
from ...schema import CHECK_RULES

OPEN_END = dt.date(9999, 12, 31)


# ---------------------------------------------------------------------------
# Load-time CHECK enforcement. The reference rejects constraint-
# violating rows at write time (01_Create.sql CHECK domains;
# 02_Trigger.sql:23,156,186-192 RAISE_APPLICATION_ERROR); a Spark load
# must do the same at its entry points or bad fixtures land silently.


def screen_oltp(oltp: dict[str, DataFrame], mode: str = "quarantine",
                rejects_out: dict[str, DataFrame] | None = None,
                ) -> dict[str, DataFrame]:
    """Apply the reference's CHECK rejection semantics to an OLTP dict.

    ``mode``:
      - ``"quarantine"`` (default): divert violating rows, load the
        rest — the scale-friendly analogue of per-row rejection; the
        diverted rows are exposed via ``rejects_out`` (pass a dict to
        receive one DataFrame per screened table).
      - ``"strict"``: raise :class:`ConstraintError` on any violation
        (RAISE_APPLICATION_ERROR parity — the whole statement fails).
      - ``"off"``: trust the input (callers that already screened).

    NULL predicates pass, matching Oracle CHECK three-valued logic.
    """
    if mode == "off":
        return dict(oltp)
    out: dict[str, DataFrame] = {}
    for name, df in oltp.items():
        rules = CHECK_RULES.get(name)
        if not rules:
            out[name] = df
            continue
        if mode == "strict":
            V.validate(df, rules, table=name)
            out[name] = df
        else:
            ok, bad = V.quarantine(df, rules)
            out[name] = ok
            if rejects_out is not None:
                rejects_out[name] = bad
    return out

# ---------------------------------------------------------------------------
# Holiday list (05_InitialLoading.sql:113-152): fixed national holidays
# 2000-2025. (The reference also defines get_moving_holiday but never
# calls it during the load; we keep parity by loading fixed dates only.)

_FIXED_HOLIDAYS = [
    (1, 1, "New Year's Day", 2000, 2025),
    (2, 1, "Federal Territory Day", 2000, 2025),
    (5, 1, "Labour Day", 2000, 2025),
    (8, 31, "National Day", 2000, 2025),
    (9, 16, "Malaysia Day", 2010, 2025),   # from 2010 (:139)
    (12, 25, "Christmas", 2000, 2025),
]


def holiday_list(spark: SparkSession) -> DataFrame:
    rows = [
        (dt.date(y, m, d), name)
        for (m, d, name, y0, y1) in _FIXED_HOLIDAYS
        for y in range(y0, y1 + 1)
    ]
    return spark.createDataFrame(rows, "cal_date date, festive_event string")


# ---------------------------------------------------------------------------
# Date dimension (05_InitialLoading.sql:157-203)


def build_dim_date(spark: SparkSession,
                   start: dt.date = dt.date(2000, 1, 1),
                   end: dt.date = dt.date(2025, 12, 31),
                   key_start: int = 100_001) -> DataFrame:
    """26-year date spine with calendar attributes + holiday/weekday/
    business-day flags. sequence()+explode replaces CONNECT BY LEVEL;
    the per-row holiday lookups (:187-193) become one broadcast join."""
    spine = spark.range(1).select(
        F.explode(F.sequence(F.lit(start), F.lit(end),
                             F.expr("interval 1 day"))).alias("cal_date")
    )
    d = F.col("cal_date")
    # Oracle TO_CHAR(d,'D') with default NLS: 1=Sunday..7=Saturday —
    # same convention as Spark dayofweek (:178,188).
    dow = F.dayofweek(d)
    hol = F.broadcast(holiday_list(spark))
    df = (
        spine.join(hol, "cal_date", "left")
        .select(
            d,
            F.date_format(d, "yyyy MMMM dd").alias("full_desc"),
            dow.cast("int").alias("day_of_week"),
            F.dayofmonth(d).cast("int").alias("day_num_month"),
            F.dayofyear(d).cast("int").alias("day_num_year"),
            F.upper(F.date_format(d, "MMMM")).alias("month_name"),
            F.month(d).cast("int").alias("cal_month_year"),
            F.concat(F.year(d), F.lit("-"), F.lpad(F.month(d), 2, "0"))
            .alias("cal_year_month"),
            X.quarter_tag(d).alias("cal_quarter"),
            F.concat(F.year(d), F.lit("-"), X.quarter_tag(d))
            .alias("cal_year_quarter"),
            F.year(d).cast("int").alias("cal_year"),
            F.when(F.col("festive_event").isNotNull(), "Y").otherwise("N")
            .alias("holiday_indicator"),
            F.when(dow.between(2, 6), "Y").otherwise("N")
            .alias("weekday_indicator"),
            F.coalesce("festive_event", F.lit("Regular Day"))
            .alias("festive_event"),
            F.when(dow.between(2, 6) & F.col("festive_event").isNull(), "Y")
            .otherwise("N").alias("business_day_ind"),
        )
    )
    return with_surrogate_key(df, "dateKey", ["cal_date"], start=key_start)


# ---------------------------------------------------------------------------
# Dimension loads (05_InitialLoading.sql:209-317)


def load_dim_book(book_titles: DataFrame) -> DataFrame:
    """DimBook initial load (:209-220): UPPER/TRIM standardization,
    non-negative rounded price, popularity NULL→3.0; SCD2 bookkeeping
    columns open-ended current."""
    df = book_titles.select(
        "bookId",
        F.lit("AVAILABLE").alias("bookStatus"),
        F.upper(F.trim("title")).alias("title"),
        F.upper(F.trim("author")).alias("author"),
        X.canonical_genre(F.col("genre")).alias("genre"),
        X.nonneg_money(F.col("salesPrice")).cast("double").alias("price"),
        F.coalesce("popularity", F.lit(3.0)).alias("popularity"),
        F.lit(dt.date(2004, 7, 1)).alias("effective_date"),
        F.lit(OPEN_END).alias("expiration_date"),
        F.lit("Y").alias("curr_ind"),
    )
    return with_surrogate_key(df, "bookKey", ["bookId"]).select(
        "bookKey", "bookId", "bookStatus", "title", "author", "genre",
        "price", "popularity", "effective_date", "expiration_date", "curr_ind")


def load_dim_members(members: DataFrame, as_of: dt.date) -> DataFrame:
    """DimMembers initial load (:226-290): age banding, gender norm,
    address → state/city, duration text, effective from registration."""
    df = members.select(
        "memberId",
        F.upper(F.trim("memberName")).alias("memberName"),
        X.age_band(F.col("memberAge")).alias("memberAgeRange"),
        X.gender_norm(F.col("memberGender")).alias("memberGender"),
        X.member_state(F.col("memberAddress")).alias("state"),
        X.member_city(F.col("memberAddress")).alias("city"),
        X.member_duration_text(F.col("registrationDate"), F.lit(as_of))
        .alias("MemberDuration"),
        F.col("registrationDate").alias("effective_date"),
        F.lit(OPEN_END).alias("expiration_date"),
        F.lit("Y").alias("curr_ind"),
    )
    return with_surrogate_key(df, "memberKey", ["memberId"]).select(
        "memberKey", "memberId", "memberName", "memberAgeRange",
        "memberGender", "state", "city", "MemberDuration",
        "effective_date", "expiration_date", "curr_ind")


def load_dim_suppliers(suppliers: DataFrame) -> DataFrame:
    """DimSuppliers (:295-317): note supplier addresses parse at
    different comma offsets than members (state=3rd-last, city=4th-last)."""
    df = suppliers.select(
        "supplierId",
        F.upper(F.trim("supplierName")).alias("supplierName"),
        X.supplier_state(F.col("suppliersAddress")).alias("State"),
        X.supplier_city(F.col("suppliersAddress")).alias("City"),
    )
    return with_surrogate_key(df, "supplierKey", ["supplierId"]).select(
        "supplierKey", "supplierId", "supplierName", "State", "City")


# ---------------------------------------------------------------------------
# Fact loads (05_InitialLoading.sql:322-434)


def load_fact_purchase(purchase_orders: DataFrame, purchase_details: DataFrame,
                       dim_date: DataFrame, dim_book: DataFrame,
                       dim_suppliers: DataFrame) -> DataFrame:
    """FactPurchase (:322-340): line quantities summed to the
    (date, book, supplier, PO) grain; totalAmount is the PO HEADER
    total (not the line sum), flag_ind = received."""
    po = purchase_orders.filter(F.col("purchaseDate").isNotNull())
    joined = (
        po.join(purchase_details, "purchaseOrderId")
        .join(F.broadcast(dim_date.select("dateKey", "cal_date")),
              po.purchaseDate == F.col("cal_date"))
        .join(F.broadcast(dim_book.select("bookKey", "bookId")), "bookId")
        .join(F.broadcast(dim_suppliers.select("supplierKey", "supplierId")),
              "supplierId")
    )
    return (
        joined.groupBy("dateKey", "bookKey", "supplierKey", "totalAmount",
                       "orderStatus", "purchaseOrderId")
        .agg(F.sum(F.greatest(F.coalesce("quantity", F.lit(0)), F.lit(0)))
             .cast("long").alias("quantity"))
        .select(
            "dateKey", "bookKey", "supplierKey", "quantity",
            X.nonneg_money(F.col("totalAmount")).cast("double")
            .alias("totalAmount"),
            F.when(F.col("orderStatus") == "Received", "Y").otherwise("N")
            .alias("flag_ind"),
            "purchaseOrderId",
        )
    )


def load_fact_borrowing(borrowed_books: DataFrame, book_copies: DataFrame,
                        dim_date: DataFrame, dim_members: DataFrame,
                        dim_book: DataFrame, as_of: dt.date) -> DataFrame:
    """FactBorrowing (:345-406): overdueDays / borrowDuration with the
    pinned ``as_of`` replacing SYSDATE; per-book returnRate =
    100×returned/total; PK-grain dedup replaces the NOT-EXISTS guard."""
    base = (
        borrowed_books.filter(F.col("borrowDate").isNotNull())
        .join(book_copies.select("copyId", "bookId"), "copyId")
    )
    # Per-book metrics as ONE window pass over the base instead of a
    # groupBy + self-join (r13, guide §2.4): the join shape evaluated
    # the borrowed⋈copies subtree twice and shuffled BOTH sides on
    # bookId; the window needs one evaluation and one exchange, and
    # every borrow of a book sits in one partition either way. Counts
    # are identical (the inner join kept every base row — metrics is
    # an aggregate OF base, so each bookId always matched).
    w_book = Window.partitionBy("bookId")
    metrics_base = (
        base.withColumn("total_borrowed",
                        F.count(F.lit(1)).over(w_book))
        .withColumn("total_returned",
                    F.sum(F.when(F.col("returnStatus") == "Returned", 1)
                          .otherwise(0)).over(w_book))
    )
    as_of_c = F.lit(as_of)
    overdue = F.coalesce(
        F.when(F.col("returnDate").isNull() & (F.col("dueDate") < as_of_c),
               F.datediff(as_of_c, F.col("dueDate")))
        .when(F.col("returnDate") > F.col("dueDate"),
              F.datediff("returnDate", "dueDate"))
        .otherwise(0), F.lit(0))
    duration = F.coalesce(
        F.when(F.col("returnDate").isNotNull(),
               F.datediff("returnDate", "borrowDate"))
        .otherwise(F.datediff(as_of_c, "borrowDate")), F.lit(0))
    return (
        metrics_base
        .join(F.broadcast(dim_date.select("dateKey", "cal_date")),
              base.borrowDate == F.col("cal_date"))
        .join(F.broadcast(dim_members.select("memberKey", "memberId")),
              "memberId")
        .join(F.broadcast(dim_book.select("bookKey", "bookId")), "bookId")
        .select(
            "dateKey", "memberKey", "bookKey",
            overdue.cast("long").alias("overdueDays"),
            duration.cast("long").alias("borrowDuration"),
            F.round(F.lit(100) * F.coalesce("total_returned", F.lit(0))
                    / F.nullif(F.col("total_borrowed"), F.lit(0)), 2)
            .alias("returnRate"),
        )
        # PK (dateKey, memberKey, bookKey): deterministic within-batch
        # dedup standing in for the row-by-row NOT EXISTS (:400-406).
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("dateKey", "memberKey", "bookKey")
            .orderBy(F.col("borrowDuration").desc())))
        .filter(F.col("_rn") == 1).drop("_rn")
    )


def load_fact_sales(sales_details: DataFrame, book_orders: DataFrame,
                    book_titles: DataFrame, discounts: DataFrame,
                    dim_date: DataFrame, dim_members: DataFrame,
                    dim_book: DataFrame) -> DataFrame:
    """FactSales (:413-434): 5-way join; discount desc left-joined with
    'No Discount' fallback; line_total non-negative rounded."""
    bo = book_orders.filter(F.col("salesDate").isNotNull())
    return (
        sales_details.join(bo, "orderId")
        .join(book_titles.select("bookId", "salesPrice"), "bookId")
        .join(F.broadcast(discounts.select("discountId", "discountName")),
              "discountId", "left")
        .join(F.broadcast(dim_date.select("dateKey", "cal_date")),
              F.col("salesDate") == F.col("cal_date"))
        .join(F.broadcast(dim_members.select("memberKey", "memberId")),
              "memberId")
        .join(F.broadcast(dim_book.select("bookKey", "bookId")), "bookId")
        .select(
            "memberKey", "bookKey", "dateKey",
            F.col("salesId").alias("sales_id"),
            F.col("salesPrice").cast("double").alias("salesPrice"),
            F.coalesce("discountAmount", F.lit(0.0)).cast("double")
            .alias("discount"),
            F.coalesce("discountName", F.lit("No Discount"))
            .alias("discount_desc"),
            X.nonneg_money(F.col("totalAmount")).cast("double")
            .alias("line_total"),
            F.greatest(F.coalesce("quantitySold", F.lit(0)), F.lit(0))
            .cast("long").alias("quantity"),
        )
    )


# ---------------------------------------------------------------------------


def initial_load(spark: SparkSession, oltp: dict[str, DataFrame],
                 as_of: dt.date, validate_mode: str = "quarantine",
                 rejects_out: dict[str, DataFrame] | None = None,
                 ) -> dict[str, DataFrame]:
    """EP2 end-to-end: dims before facts (the only ordering constraint,
    SURVEY.md §3). CHECK rules are enforced at entry (``screen_oltp``)
    so constraint-violating source rows are rejected, not loaded —
    02_Trigger.sql:23,156,186-192 parity."""
    oltp = screen_oltp(oltp, validate_mode, rejects_out)
    dim_date = build_dim_date(spark)
    dim_book = load_dim_book(oltp["book_titles"])
    dim_members = load_dim_members(oltp["members"], as_of)
    dim_suppliers = load_dim_suppliers(oltp["suppliers"])
    return {
        "dim_date": dim_date,
        "dim_book": dim_book,
        "dim_members": dim_members,
        "dim_suppliers": dim_suppliers,
        "fact_purchase": load_fact_purchase(
            oltp["purchase_orders"], oltp["purchase_details"],
            dim_date, dim_book, dim_suppliers),
        "fact_borrowing": load_fact_borrowing(
            oltp["borrowed_books"], oltp["book_copies"],
            dim_date, dim_members, dim_book, as_of),
        "fact_sales": load_fact_sales(
            oltp["sales_details"], oltp["book_orders"], oltp["book_titles"],
            oltp["discounts"], dim_date, dim_members, dim_book),
    }
