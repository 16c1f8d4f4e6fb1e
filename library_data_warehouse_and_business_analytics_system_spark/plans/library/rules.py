"""The reference's 13 triggers re-expressed as batch derivation and
validation operators (SURVEY.md §2.10: "derivation/validation rules our
ETL must reproduce as column expressions and data-quality checks").

Two families:
- ``derive_*`` — compute the column the trigger would have filled
  (fine amounts, payment amounts, PO totals, sales line amounts,
  attendance status, copy status). Pure column expressions / joins;
  no UDFs; every join against a small lookup is broadcast.
- ``*_violations`` — return the rows the trigger would have REJECTED
  (RAISE_APPLICATION_ERROR paths). Composable with
  operators/validate.quarantine.

Derivations must run in dependency order (SURVEY.md §7 risk 6):
fine amounts → payment amounts → fine status — ``derive_all`` does.

Money semantics: Oracle ROUND = HALF_UP on decimals
(02_Trigger.sql:452-453); we round through DecimalType like the fact
loaders do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _money_round(col):
    """HALF_UP 2dp via decimal — Oracle ROUND parity."""
    return F.round(col.cast("decimal(18,6)"), 2).cast("double")


# ---------------------------------------------------------------------------
# trg_auto_expire_membership (02_Trigger.sql:2-11)


def auto_expire_membership(members: DataFrame, as_of) -> DataFrame:
    """expireDate <= as_of ∧ status='active' → status:='expire'.
    The trigger fires on read-the-clock; batch form recomputes the
    status column against an injected as_of date (SURVEY.md §7 risk 1:
    SYSDATE must be a parameter)."""
    return members.withColumn(
        "memberStatus",
        F.when((F.col("expireDate") <= F.lit(as_of))
               & (F.col("memberStatus") == "active"), F.lit("expire"))
        .otherwise(F.col("memberStatus")))


# ---------------------------------------------------------------------------
# TRG_MANAGE_BOOK_DETAILS (02_Trigger.sql:14-41) — reject rules.


def book_detail_violations(book_titles: DataFrame, as_of_year: int) -> DataFrame:
    """Rows the trigger would reject: future publication year, negative
    prices, popularity outside [1,5]."""
    t = book_titles
    return t.select(
        "bookId",
        F.when(F.col("publicationYear") > as_of_year,
               F.lit("future_publication_year"))
        .when((F.col("purchasePrice") < 0) | (F.col("salesPrice") < 0),
              F.lit("negative_price"))
        .when(~F.col("popularity").between(1.0, 5.0)
              & F.col("popularity").isNotNull(),
              F.lit("popularity_out_of_range"))
        .alias("violation"),
    ).filter(F.col("violation").isNotNull())


# ---------------------------------------------------------------------------
# TRG_MANAGE_BOOK_STATUS_BB (02_Trigger.sql:45-99)


def derive_copy_status(book_copies: DataFrame,
                       borrowed_books: DataFrame) -> DataFrame:
    """A copy with an open loan ('On loan'/'Overdue') is 'borrowed'.
    The compound trigger applies this per statement; batch form is a
    semi-join recompute over the whole table."""
    on_loan = (borrowed_books
               .filter(F.col("returnStatus").isin("On loan", "Overdue"))
               .select("copyId").distinct())
    return (
        book_copies.join(on_loan.withColumn("_loaned", F.lit(1)),
                         "copyId", "left")
        .withColumn(
            "bookStatus",
            F.when(F.col("_loaned").isNotNull()
                   & (F.col("bookStatus") != "unavailable"),
                   F.lit("borrowed")).otherwise(F.col("bookStatus")))
        .drop("_loaned")
    )


# ---------------------------------------------------------------------------
# trg_auto_mark_late (02_Trigger.sql:104-123)


def mark_attendance(attendance: DataFrame, schedules: DataFrame,
                    shifts: DataFrame) -> DataFrame:
    """actualStart > scheduled shift start (on the shift's date) →
    'Late' else 'Present'; null actuals stay as recorded ('Absent')."""
    sched = schedules.join(F.broadcast(shifts), "shiftId").select(
        "scheduleId",
        F.to_timestamp(F.concat_ws(
            " ", F.col("shiftDate").cast("string"),
            F.date_format("startTime", "HH:mm:ss"))).alias("schedStart"))
    return (
        attendance.join(F.broadcast(sched), "scheduleId", "left")
        .withColumn(
            "attendanceStatus",
            F.when(F.col("actualStartTime").isNull(),
                   F.col("attendanceStatus"))
            .when(F.col("actualStartTime") > F.col("schedStart"), "Late")
            .otherwise("Present"))
        .drop("schedStart")
    )


# ---------------------------------------------------------------------------
# trg_check_weekly_hours (02_Trigger.sql:126-159)


def weekly_hours_violations(schedules: DataFrame, shifts: DataFrame,
                            max_hours: float = 40.0) -> DataFrame:
    """Staff-ISO-weeks whose scheduled hours exceed ``max_hours``
    (TRUNC(date,'IW') ≙ date_trunc('WEEK')). Returns (staffId,
    week_start, total_hours) for the weeks the trigger would reject."""
    hours = (F.unix_timestamp("endTime") - F.unix_timestamp("startTime")) / 3600.0
    sched = schedules.join(F.broadcast(shifts), "shiftId").select(
        "staffId", F.date_trunc("WEEK", "shiftDate").cast("date")
        .alias("week_start"), hours.alias("h"))
    return (
        sched.groupBy("staffId", "week_start")
        .agg(F.sum("h").alias("total_hours"))
        .filter(F.col("total_hours") > max_hours)
    )


# ---------------------------------------------------------------------------
# trg_bb_member_valid (02_Trigger.sql:162-195)


def borrow_window_violations(borrowed_books: DataFrame,
                             members: DataFrame) -> DataFrame:
    """Borrows outside the member's [registrationDate, expireDate]."""
    m = members.select("memberId", "registrationDate", "expireDate")
    return (
        borrowed_books.join(m, "memberId")
        .filter(~F.col("borrowDate").between(F.col("registrationDate"),
                                             F.col("expireDate")))
        .select("borrowId", "memberId", "borrowDate",
                "registrationDate", "expireDate")
    )


# ---------------------------------------------------------------------------
# TRG_CALCULATE_FINE_AMOUNT (02_Trigger.sql:199-224)


def derive_fine_amounts(fines: DataFrame, borrowed_books: DataFrame,
                        book_copies: DataFrame,
                        book_titles: DataFrame) -> DataFrame:
    """Fill NULL fineAmount from the borrowed copy's title price via the
    3-table chain (the trigger's correlated scalar lookup, rewritten as
    broadcast joins): Lost Book → salesPrice+20, Damage → salesPrice,
    Late Return → 30."""
    price = (
        borrowed_books.select("borrowId", "copyId")
        .join(F.broadcast(book_copies.select("copyId", "bookId")), "copyId")
        .join(F.broadcast(book_titles.select("bookId", "salesPrice")), "bookId")
        .select("borrowId", "salesPrice")
    )
    return (
        fines.join(price, "borrowId", "left")
        .withColumn(
            "fineAmount",
            F.coalesce(
                F.col("fineAmount"),
                F.when(F.col("fineType") == "Lost Book",
                       _money_round(F.col("salesPrice") + 20))
                .when(F.col("fineType") == "Damage",
                      _money_round(F.col("salesPrice")))
                .when(F.col("fineType") == "Late Return", F.lit(30.0))))
        .drop("salesPrice")
    )


# ---------------------------------------------------------------------------
# TRG_CALCULATE_PAYMENT_AMOUNT (02_Trigger.sql:227-246)


def derive_payment_amounts(payments: DataFrame, fines: DataFrame) -> DataFrame:
    """Fill NULL payAmount: 'Fines' → Σ linked fineAmount,
    'Membership Registration' → 50."""
    fine_sums = (fines.filter(F.col("paymentId").isNotNull())
                 .groupBy("paymentId")
                 .agg(_money_round(
                     F.sum(F.col("fineAmount").cast("decimal(18,6)")))
                     .alias("_fineSum")))
    return (
        payments.join(fine_sums, "paymentId", "left")
        .withColumn(
            "payAmount",
            F.coalesce(
                F.col("payAmount"),
                F.when(F.col("paymentType") == "Fines", F.col("_fineSum"))
                .when(F.col("paymentType") == "Membership Registration",
                      F.lit(50.0))))
        .drop("_fineSum")
    )


# ---------------------------------------------------------------------------
# TRG_MANAGE_PAYMENTS (02_Trigger.sql:278-297)


def apply_fine_payments(fines: DataFrame, payments: DataFrame) -> DataFrame:
    """A fine linked to a 'Fines' payment becomes 'Paid'."""
    fine_pay = payments.filter(F.col("paymentType") == "Fines") \
        .select("paymentId").distinct()
    return (
        fines.join(fine_pay.withColumn("_paid", F.lit(1)),
                   "paymentId", "left")
        .withColumn("fineStatus",
                    F.when(F.col("_paid").isNotNull(), "Paid")
                    .otherwise(F.col("fineStatus")))
        .drop("_paid")
    )


# ---------------------------------------------------------------------------
# trg_check_purchase_total (02_Trigger.sql:303-357) +
# trg_guard_po_total (:360-379)


def derive_po_totals(purchase_details: DataFrame,
                     book_titles: DataFrame) -> DataFrame:
    """Recompute PO header totals: Σ quantity × purchasePrice, 2dp."""
    return (
        purchase_details
        .join(F.broadcast(book_titles.select("bookId", "purchasePrice")),
              "bookId")
        .groupBy("purchaseOrderId")
        .agg(_money_round(
            F.sum(F.col("quantity")
                  * F.col("purchasePrice").cast("decimal(18,6)")))
            .alias("computedTotal"))
    )


def po_total_violations(purchase_orders: DataFrame,
                        purchase_details: DataFrame,
                        book_titles: DataFrame,
                        tolerance: float = 0.011) -> DataFrame:
    """Headers whose stored total disagrees with Σ details beyond a
    one-cent rounding tolerance."""
    computed = derive_po_totals(purchase_details, book_titles)
    return (
        purchase_orders.join(computed, "purchaseOrderId", "left")
        .filter(F.abs(F.col("totalAmount")
                      - F.coalesce(F.col("computedTotal"), F.lit(0.0)))
                > tolerance)
        .select("purchaseOrderId", "totalAmount", "computedTotal")
    )


# ---------------------------------------------------------------------------
# trg_BookOrders_DiscDate (02_Trigger.sql:383-409)


def discount_validity_violations(book_orders: DataFrame,
                                 discounts: DataFrame) -> DataFrame:
    """Orders whose discount is not active on salesDate (the trigger
    rejects these; D-range join is the J7 validity-window shape)."""
    d = F.broadcast(discounts.select(
        "discountId", "discountStart", "discountEnd"))
    return (
        book_orders.join(d, "discountId", "left")
        .filter(~F.col("salesDate").between(F.col("discountStart"),
                                            F.col("discountEnd")))
        .select("orderId", "discountId", "salesDate",
                "discountStart", "discountEnd")
    )


# ---------------------------------------------------------------------------
# trg_salesdetails_calc_amounts (02_Trigger.sql:412-455)


def derive_sales_amounts(sales_details: DataFrame, book_orders: DataFrame,
                         discounts: DataFrame,
                         book_titles: DataFrame) -> DataFrame:
    """gross = salesPrice × qty; discountAmount = round(gross×rate/100);
    totalAmount = gross − discountAmount. Discount rate comes from the
    order's discount; price from the title (both broadcast)."""
    order_disc = book_orders.select("orderId", "discountId").join(
        F.broadcast(discounts.select("discountId", "discountRate")),
        "discountId")
    priced = (
        sales_details
        .join(F.broadcast(book_titles.select("bookId", "salesPrice")),
              "bookId")
        .join(F.broadcast(order_disc.select("orderId", "discountRate")),
              "orderId", "left")
    )
    gross = _money_round(F.col("salesPrice").cast("decimal(18,6)")
                         * F.col("quantitySold"))
    disc_amt = _money_round(gross.cast("decimal(18,6)")
                            * F.coalesce(F.col("discountRate"), F.lit(0.0))
                            .cast("decimal(18,6)") / 100)
    return (
        priced
        .withColumn("discountAmount", disc_amt)
        .withColumn("totalAmount",
                    _money_round(gross.cast("decimal(18,6)")
                                 - F.col("discountAmount")
                                 .cast("decimal(18,6)")))
        .drop("salesPrice", "discountRate")
    )


# ---------------------------------------------------------------------------
# trg_dimbook_unavail_to_copies (06_Type2_DimBook.sql:2-16)


def cascade_unavailable(book_copies: DataFrame,
                        dim_book: DataFrame) -> DataFrame:
    """DimBook current version UNAVAILABLE → its copies unavailable."""
    unavail = (dim_book
               .filter((F.col("curr_ind") == "Y")
                       & (F.upper("bookStatus") == "UNAVAILABLE"))
               .select("bookId").distinct())
    return (
        book_copies.join(unavail.withColumn("_u", F.lit(1)), "bookId", "left")
        .withColumn("bookStatus",
                    F.when(F.col("_u").isNotNull(), "unavailable")
                    .otherwise(F.col("bookStatus")))
        .drop("_u")
    )


# ---------------------------------------------------------------------------
# dependency-ordered application (SURVEY.md §7 risk 6)


def derive_all(oltp: dict[str, DataFrame], as_of) -> dict[str, DataFrame]:
    """Apply every derivation in trigger-dependency order:
    fine amounts → payment amounts → fine status; plus member expiry,
    copy status, attendance marking, PO totals, sales amounts."""
    out = dict(oltp)
    out["members"] = auto_expire_membership(oltp["members"], as_of)
    out["book_copies"] = derive_copy_status(oltp["book_copies"],
                                            oltp["borrowed_books"])
    out["staff_attendance"] = mark_attendance(
        oltp["staff_attendance"], oltp["shift_schedules"], oltp["shift"])
    fines = derive_fine_amounts(oltp["fines"], oltp["borrowed_books"],
                                oltp["book_copies"], oltp["book_titles"])
    out["payments"] = derive_payment_amounts(oltp["payments"], fines)
    out["fines"] = apply_fine_payments(fines, out["payments"])
    out["sales_details"] = derive_sales_amounts(
        oltp["sales_details"], oltp["book_orders"], oltp["discounts"],
        oltp["book_titles"])
    return out
