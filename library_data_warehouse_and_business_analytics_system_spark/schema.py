"""Explicit schemas for the library warehouse: 16 OLTP tables + 4
dimensions + 3 facts, with the reference's CHECK-constraint domains
expressed as validation rules (Spark has no declarative CHECK; see
operators/validate.py).

Source of truth: /root/reference/01_Create.sql:63-273 (OLTP),
04_CreateDimensionFact.sql:13-121 (DW). Oracle type mapping per
SURVEY.md §1.2: NUMBER(p,2) money → DecimalType, unscaled NUMBER →
LongType, DATE → DateType, TIMESTAMP → TimestampType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# OLTP layer


def _s(*fields: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


STR = T.StringType()
DATE = T.DateType()
TS = T.TimestampType()
LONG = T.LongType()
INT = T.IntegerType()
MONEY = T.DecimalType(10, 2)
DOUBLE = T.DoubleType()

MEMBERS = _s(
    ("memberId", STR, False), ("memberName", STR, False),
    ("memberTel", STR, False), ("memberEmail", STR, False),
    ("memberGender", STR, False), ("memberAge", INT, False),
    ("memberAddress", STR, False), ("memberStatus", STR, False),
    ("registrationDate", DATE, False), ("expireDate", DATE, False),
)

STAFF = _s(
    ("staffId", STR, False), ("staffName", STR, False),
    ("staffEmail", STR, False), ("staffTel", STR, False), ("role", STR, False),
)

SHIFT = _s(
    ("shiftId", STR, False), ("shiftType", STR, False),
    ("startTime", TS, False), ("endTime", TS, False),
)

BOOK_TITLES = _s(
    ("bookId", STR, False), ("title", STR, False), ("author", STR, False),
    ("genre", STR, False), ("publicationYear", INT, False),
    ("purchasePrice", DOUBLE, False), ("salesPrice", DOUBLE, False),
    ("popularity", DOUBLE, True),
)

BOOK_COPIES = _s(
    ("copyId", STR, False), ("bookId", STR, False), ("bookStatus", STR, False),
)

BORROWED_BOOKS = _s(
    ("borrowId", STR, False), ("memberId", STR, False), ("copyId", STR, False),
    ("borrowDate", DATE, False), ("dueDate", DATE, False),
    ("returnDate", DATE, True), ("returnStatus", STR, False),
    ("extendStatus", STR, True),
)

SHIFT_SCHEDULES = _s(
    ("scheduleId", STR, False), ("shiftId", STR, False),
    ("staffId", STR, False), ("shiftDate", DATE, False),
)

STAFF_ATTENDANCE = _s(
    ("attendanceId", STR, False), ("scheduleId", STR, False),
    ("attendanceStatus", STR, False),
    ("actualStartTime", TS, True), ("actualEndTime", TS, True),
)

PAYMENTS = _s(
    ("paymentId", STR, False), ("memberId", STR, False),
    ("paymentDate", DATE, False), ("payAmount", DOUBLE, True),
    ("paymentMethod", STR, False), ("paymentType", STR, False),
    ("receiptNo", STR, False),
)

FINES = _s(
    ("fineId", STR, False), ("borrowId", STR, False), ("paymentId", STR, True),
    ("fineType", STR, False), ("fineAmount", DOUBLE, True),
    ("fineDate", DATE, False), ("fineStatus", STR, False),
)

SUPPLIERS = _s(
    ("supplierId", STR, False), ("supplierName", STR, False),
    ("contactPerson", STR, False), ("supplierTel", STR, False),
    ("suppliersAddress", STR, False),
)

DISCOUNTS = _s(
    ("discountId", STR, False), ("discountName", STR, False),
    ("discountRate", DOUBLE, True),
    ("discountStart", DATE, True), ("discountEnd", DATE, True),
)

BOOK_ORDERS = _s(
    ("orderId", STR, False), ("paymentId", STR, False),
    ("discountId", STR, False), ("memberId", STR, False),
    ("salesDate", DATE, True),
)

SALES_DETAILS = _s(
    ("salesId", STR, False), ("orderId", STR, False), ("bookId", STR, False),
    ("quantitySold", LONG, True), ("discountAmount", DOUBLE, True),
    ("totalAmount", DOUBLE, True),
)

PURCHASE_ORDERS = _s(
    ("purchaseOrderId", STR, False), ("supplierId", STR, False),
    ("purchaseDate", DATE, False), ("totalAmount", DOUBLE, False),
    ("orderStatus", STR, False),
)

PURCHASE_DETAILS = _s(
    ("detailId", STR, False), ("purchaseOrderId", STR, False),
    ("bookId", STR, False), ("quantity", LONG, True),
)

OLTP_SCHEMAS: dict[str, T.StructType] = {
    "members": MEMBERS, "staff": STAFF, "shift": SHIFT,
    "book_titles": BOOK_TITLES, "book_copies": BOOK_COPIES,
    "borrowed_books": BORROWED_BOOKS, "shift_schedules": SHIFT_SCHEDULES,
    "staff_attendance": STAFF_ATTENDANCE, "payments": PAYMENTS,
    "fines": FINES, "suppliers": SUPPLIERS, "discounts": DISCOUNTS,
    "book_orders": BOOK_ORDERS, "sales_details": SALES_DETAILS,
    "purchase_orders": PURCHASE_ORDERS, "purchase_details": PURCHASE_DETAILS,
}

# --------------------------------------------------------------------------
# CHECK-constraint domains (01_Create.sql) → validation rules consumed by
# operators/validate.py. Expressed as SQL boolean strings over one row.

CHECK_RULES: dict[str, list[tuple[str, str]]] = {
    "members": [
        ("ck_members_gender", "memberGender IN ('female','male')"),
        ("ck_members_age", "memberAge BETWEEN 12 AND 74"),
        ("chk_memberStatus", "memberStatus IN ('active','expire')"),
    ],
    "book_titles": [
        ("chk_purchasePrice", "purchasePrice >= 0"),
        ("chk_salesPrice", "salesPrice >= 0"),
        ("chk_popularity", "popularity IS NULL OR popularity BETWEEN 1.0 AND 5.0"),
    ],
    "book_copies": [
        ("chk_BookStatus",
         "bookStatus IN ('available','reserved','borrowed','unavailable')"),
    ],
    "borrowed_books": [
        ("chk_returnStatus",
         "returnStatus IN ('On loan','Returned','Overdue','Lost')"),
        ("chk_extendStatus",
         "extendStatus IS NULL OR extendStatus IN "
         "('Unsubmitted','Pending','Approved','Rejected','Canceled')"),
    ],
    "shift": [("chk_shift_time", "startTime < endTime")],
    "staff": [
        ("chk_role",
         "role IN ('librarian','manager','assistant','security','cleaner')"),
    ],
    "staff_attendance": [
        ("chk_attendanceStatus", "attendanceStatus IN ('Present','Absent','Late')"),
        ("chk_StaffAttendance_Time",
         "actualStartTime IS NULL OR actualEndTime IS NULL "
         "OR actualStartTime < actualEndTime"),
    ],
    "payments": [
        ("chk_paymentMethod", "paymentMethod IN ('Tng','Cash','Duitnow')"),
        ("chk_paymentType",
         "paymentType IN ('Fines','Membership Registration','Book Sale')"),
    ],
    "fines": [
        ("chk_fineType", "fineType IN ('Late Return','Lost Book','Damage')"),
        ("chk_fineStatus", "fineStatus IN ('Unpaid','Paid')"),
    ],
    "discounts": [
        ("chk_discounts_range",
         "discountStart IS NULL OR discountEnd IS NULL "
         "OR discountStart < discountEnd"),
        ("chk_discountRate",
         "discountRate IS NULL OR discountRate BETWEEN 0 AND 100"),
    ],
    "purchase_orders": [
        ("chk_orderStatus", "orderStatus IN ('Received','Pending','Cancelled')"),
    ],
    "purchase_details": [
        ("chk_pd_qty_nonneg", "quantity IS NULL OR quantity >= 0"),
    ],
}

# --------------------------------------------------------------------------
# DW layer (04_CreateDimensionFact.sql)

DIM_DATE = _s(
    ("dateKey", LONG, False), ("cal_date", DATE, False),
    ("full_desc", STR, True), ("day_of_week", INT, True),
    ("day_num_month", INT, True), ("day_num_year", INT, True),
    ("month_name", STR, True), ("cal_month_year", INT, True),
    ("cal_year_month", STR, True), ("cal_quarter", STR, True),
    ("cal_year_quarter", STR, True), ("cal_year", INT, True),
    ("holiday_indicator", STR, True), ("weekday_indicator", STR, True),
    ("festive_event", STR, True), ("business_day_ind", STR, True),
)

DIM_MEMBERS = _s(
    ("memberKey", LONG, False), ("memberId", STR, False),
    ("memberName", STR, False), ("memberAgeRange", STR, True),
    ("memberGender", STR, True), ("state", STR, True), ("city", STR, True),
    ("MemberDuration", STR, True), ("effective_date", DATE, True),
    ("expiration_date", DATE, True), ("curr_ind", STR, True),
)

DIM_BOOK = _s(
    ("bookKey", LONG, False), ("bookId", STR, False),
    ("bookStatus", STR, True), ("title", STR, True), ("author", STR, True),
    ("genre", STR, True), ("price", DOUBLE, True), ("popularity", DOUBLE, True),
    ("effective_date", DATE, True), ("expiration_date", DATE, True),
    ("curr_ind", STR, True),
)

DIM_SUPPLIERS = _s(
    ("supplierKey", LONG, False), ("supplierId", STR, False),
    ("supplierName", STR, True), ("State", STR, True), ("City", STR, True),
)

FACT_PURCHASE = _s(
    ("dateKey", LONG, False), ("bookKey", LONG, False),
    ("supplierKey", LONG, False), ("quantity", LONG, False),
    ("totalAmount", DOUBLE, False), ("flag_ind", STR, False),
    ("purchaseOrderId", STR, False),
)

FACT_BORROWING = _s(
    ("dateKey", LONG, False), ("memberKey", LONG, False),
    ("bookKey", LONG, False), ("overdueDays", LONG, False),
    ("borrowDuration", LONG, False), ("returnRate", DOUBLE, False),
)

FACT_SALES = _s(
    ("memberKey", LONG, False), ("bookKey", LONG, False),
    ("dateKey", LONG, False), ("sales_id", STR, False),
    ("salesPrice", DOUBLE, False), ("discount", DOUBLE, False),
    ("discount_desc", STR, False), ("line_total", DOUBLE, False),
    ("quantity", LONG, False),
)

DW_SCHEMAS: dict[str, T.StructType] = {
    "dim_date": DIM_DATE, "dim_members": DIM_MEMBERS, "dim_book": DIM_BOOK,
    "dim_suppliers": DIM_SUPPLIERS, "fact_purchase": FACT_PURCHASE,
    "fact_borrowing": FACT_BORROWING, "fact_sales": FACT_SALES,
}
