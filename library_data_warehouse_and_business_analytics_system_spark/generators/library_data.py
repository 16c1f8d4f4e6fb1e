"""Deterministic library-domain fixture generators.

Python re-expressions of the reference's PL/SQL generator procedures
(SURVEY.md §2.10): same distributions, enum domains, derivation rules
and invariants (FIXTURES.md §A), driven by a seeded ``random.Random``
so every run is reproducible. Row counts scale with ``scale`` (1.0 =
reference-designed volumes; tests use ~0.02).

Business rules that the reference enforces via triggers are applied
here at generation time in dependency order (SURVEY.md §7 risk 6):
fine amounts → payment amounts → fine status
(02_Trigger.sql:199-246), PO header totals = Σ details
(02_Trigger.sql:303-357), sales line amounts
(02_Trigger.sql:412-455).
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .. import schema as S

DATA_START = dt.date(2004, 7, 1)   # 02_InsertMembers.sql:50-51
DATA_END = dt.date(2024, 6, 30)
AS_OF = DATA_END                   # pinned SYSDATE (SURVEY.md §7 risk 1)

STATES = [  # 02_InsertMembers.sql:72 — 13 Malaysian states
    "Johor", "Kedah", "Kelantan", "Melaka", "Negeri Sembilan", "Pahang",
    "Penang", "Perak", "Perlis", "Sabah", "Sarawak", "Selangor", "Terengganu",
]
CITIES = ["Alpha City", "Beta Town", "Gamma Port", "Delta Hills", "Epsilon Bay"]
STREETS = ["Jalan Merdeka", "Jalan Besar", "Lorong Satu", "Persiaran Dua",
           "Jalan Tun Razak"]
GENRES = [  # 04_InsertBookTitles.sql:8-13 incl. deliberate dirty variants
    "Fiction", "Non Fiction", "Non fiction", "Nonfiction", "Mystery",
    "Science", "HIstory", "Romance", "Fantasy", "Biography", "Children",
    "Travel", "Poetry", "Self Help",
]
ADJS = ["Silent", "Golden", "Hidden", "Lost", "Bright", "Dark", "Gentle",
        "Wild", "Ancient", "Modern"]
NOUNS = ["River", "Mountain", "Garden", "Library", "Voyage", "Secret",
         "Promise", "Shadow", "Harbor", "Season"]
THEMES = ["Time", "Memory", "Hope", "Winter", "Morning", "Destiny",
          "Silence", "Courage", "Wonder", "Change"]
FIRSTS = ["Aisha", "Ben", "Chen", "Devi", "Emil", "Farah", "Gopal", "Hana",
          "Iqbal", "Jun"]
LASTS = ["Tan", "Lim", "Abdullah", "Kumar", "Wong", "Ismail", "Lee", "Raj",
         "Ng", "Hassan"]


def _fmt(prefix: str, n: int, width: int) -> str:
    # fmt_id('PO', 12, 4) → 'PO0012' (01_helpers.sql:48-53)
    return f"{prefix}{n:0{width}d}"


def _rnd_date(rng: random.Random, lo: dt.date, hi: dt.date) -> dt.date:
    # rnd_date(lo, hi) (01_helpers.sql:40-45)
    return lo + dt.timedelta(days=rng.randrange((hi - lo).days + 1))


def _add_months(d: dt.date, months: int) -> dt.date:
    y, m = divmod((d.year * 12 + d.month - 1) + months, 12)
    m += 1
    day = min(d.day, [31, 29 if y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
                      else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m - 1])
    return dt.date(y, m, day)


@dataclass
class LibraryData:
    """All 16 OLTP tables as row lists, pre-DataFrame."""
    tables: dict[str, list[tuple]] = field(default_factory=dict)

    def to_spark(self, spark: SparkSession) -> dict[str, DataFrame]:
        # Route through pandas so createDataFrame takes the Arrow path
        # instead of per-row pickling (3× faster at scale=1.0, ~560k
        # rows; content verified identical). dtype=object keeps None /
        # date values untouched — the explicit schema does the typing.
        #
        # The lazy localCheckpoint converts each frame's plan leaf from
        # a LocalRelation — scale=1.0 embeds ~560k rows INSIDE the
        # logical plan, which every downstream analysis/optimization
        # walks and every query execution re-ships driver→executors —
        # into a compact executor-resident RDD leaf computed once at
        # first use (r13, guide §5 "the driver should do almost no
        # data work"). Measured on the ETL section at scale=1.0:
        # warm to_spark+initial_load 10.7 s → 8.6 s, LQY trio
        # 6.4 s → 5.5 s, and the run-to-run swing (10.7–44 s across
        # reps) collapses to ±0.2 s. eager=False skips materializing
        # tables a caller never touches.
        import pandas as pd

        out = {}
        for name, rows in self.tables.items():
            sch = S.OLTP_SCHEMAS[name]
            pdf = pd.DataFrame(rows, columns=[f.name for f in sch.fields],
                               dtype=object)
            out[name] = spark.createDataFrame(pdf, sch) \
                .localCheckpoint(eager=False)
        return out


def generate(seed: int = 42, scale: float = 0.02) -> LibraryData:  # noqa: C901
    rng = random.Random(seed)
    out = LibraryData()

    n_members = max(20, int(7500 * scale))       # 02_InsertMembers.sql:190
    n_titles = max(20, int(9000 * scale))        # 04_InsertBookTitles.sql:2
    n_copies = max(40, int(45000 * scale))       # 05_InsertBookCopies.sql:3
    n_borrows = max(100, int(200000 * scale))    # 06_InsertBorrowedBooks.sql:25

    # ---- members (02_InsertMembers.sql:46-185): yearly cohorts,
    # 65/35 gender, age 12-74, 75% active target via renewals.
    members = []
    years = list(range(2004, 2024))
    for i in range(1, n_members + 1):
        cohort = years[(i - 1) % len(years)]
        lo = max(dt.date(cohort, 7, 1), DATA_START)
        hi = min(dt.date(cohort + 1, 6, 30), DATA_END)
        reg = _rnd_date(rng, lo, hi)
        active_target = rng.random() < 0.75
        if active_target:
            # renew long enough to stay active at AS_OF
            k = max(0, (AS_OF.year - reg.year)) + rng.randrange(0, 3)
        else:
            k = rng.randrange(0, max(1, (AS_OF.year - reg.year) or 1))
        expire = _add_months(reg, 12 * (1 + k)) - dt.timedelta(days=1)
        status = "active" if expire >= AS_OF else "expire"
        gender = "female" if rng.random() < 0.65 else "male"
        city = rng.choice(CITIES)
        state = rng.choice(STATES)
        addr = (f"{rng.randrange(10, 300)} {rng.choice(STREETS)}, "
                f"{city}, {state}, Malaysia")
        members.append((
            _fmt("M", i, 4), f"{rng.choice(FIRSTS)} {rng.choice(LASTS)}",
            f"01{rng.randrange(10)}-{i:07d}", f"member{i}@example.com",
            gender, rng.randrange(12, 75), addr, status, reg, expire,
        ))
    out.tables["members"] = members

    # ---- book titles (04_InsertBookTitles.sql): cyclic banks, price
    # 15-150, purchase = 0.8×sales (:124), popularity 1.0-5.0.
    titles = []
    for i in range(1, n_titles + 1):
        sales_price = round(rng.uniform(15.0, 150.0), 2)
        titles.append((
            _fmt("B", i, 4),
            f"{ADJS[i % 10]} {NOUNS[(i // 10) % 10]} of {THEMES[(i // 100) % 10]} #{i}",
            f"{FIRSTS[i % 10]} {LASTS[(i // 10) % 10]}",
            GENRES[i % len(GENRES)],
            rng.randrange(1950, 2025),
            round(0.8 * sales_price, 2),
            sales_price,
            round(rng.uniform(1.0, 5.0), 1),
        ))
    out.tables["book_titles"] = titles

    # ---- book copies (05_InsertBookCopies.sql): random title per copy.
    copies = []
    for i in range(1, n_copies + 1):
        copies.append((
            _fmt("C", i, 5), _fmt("B", rng.randrange(1, n_titles + 1), 4),
            rng.choice(["available"] * 8 + ["borrowed", "reserved"]),
        ))
    out.tables["book_copies"] = copies

    # ---- borrowed books (06_InsertBorrowedBooks.sql): weekday borrow
    # dates, due = borrow + 10 (:132), status mix ~85/8/2/5
    # Returned/Overdue/Lost/On loan (:41-53), member-validity window
    # honored (02_Trigger.sql:162-195).
    borrows = []
    member_by_idx = members
    for i in range(1, n_borrows + 1):
        m = member_by_idx[rng.randrange(n_members)]
        m_id, reg, exp = m[0], m[8], m[9]
        hi = min(exp, DATA_END)
        if reg > hi:
            continue
        bdate = _rnd_date(rng, reg, hi)
        while bdate.weekday() >= 5:  # weekdays only (:117)
            bdate = _rnd_date(rng, reg, hi)
            if (hi - reg).days < 3:
                break
        due = bdate + dt.timedelta(days=10)
        r = rng.random()
        if r < 0.85:
            status = "Returned"
            ret = bdate + dt.timedelta(days=rng.randrange(1, 15))  # some late
        elif r < 0.93:
            status = "Overdue"
            ret = None
        elif r < 0.95:
            status = "Lost"
            ret = None
        else:
            status = "On loan"
            ret = None
        borrows.append((
            _fmt("BR", i, 6), m_id, _fmt("C", rng.randrange(1, n_copies + 1), 5),
            bdate, due, ret, status, "Unsubmitted",
        ))
    out.tables["borrowed_books"] = borrows

    # ---- suppliers (10_InsertSuppliers.sql): 15 static rows, address
    # with 5 comma-parts so state=3rd-last, city=4th-last parse works.
    suppliers = []
    for i in range(1, 16):
        city, state = rng.choice(CITIES), rng.choice(STATES)
        suppliers.append((
            _fmt("S", i, 4), f"Supplier {LASTS[i % 10]} Sdn Bhd",
            f"{rng.choice(FIRSTS)} {rng.choice(LASTS)}",
            f"03-{i:07d}",
            f"{rng.randrange(1, 99)} {rng.choice(STREETS)}, {city}, {state}, "
            f"{rng.randrange(10000, 99999)}, Malaysia",
        ))
    out.tables["suppliers"] = suppliers

    # ---- discounts (11_InsertDiscount.sql): 64 campaigns.
    discounts = [("D0000", "No Discount", 0.0, DATA_START, dt.date(9999, 12, 31))]
    for i in range(1, 64):
        start = _rnd_date(rng, DATA_START, DATA_END - dt.timedelta(days=60))
        discounts.append((
            _fmt("D", i, 4), f"Campaign {i}",
            float(rng.randrange(5, 51)), start,
            start + dt.timedelta(days=rng.randrange(14, 90)),
        ))
    out.tables["discounts"] = discounts

    # ---- purchase orders + details (12_InsertPurchase.sql): ~2/mo,
    # 7-10 lines, qty 5-40, header total = Σ qty×purchasePrice
    # (trg_check_purchase_total, 02_Trigger.sql:303-357).
    pos, pds = [], []
    po_n, pd_n = 0, 0
    month = DATA_START
    price_of = {t[0]: t[5] for t in titles}  # purchasePrice
    while month <= DATA_END:
        for _ in range(rng.randrange(2, max(3, int(6 * min(1.0, scale * 10))))):
            po_n += 1
            po_id = _fmt("PO", po_n, 4)
            pdate = _rnd_date(rng, month, min(_add_months(month, 1)
                                              - dt.timedelta(days=1), DATA_END))
            total = 0.0
            for _ in range(rng.randrange(7, 11)):
                pd_n += 1
                b_id = _fmt("B", rng.randrange(1, n_titles + 1), 4)
                qty = rng.randrange(5, 41)
                total += qty * price_of[b_id]
                pds.append((_fmt("PD", pd_n, 6), po_id, b_id, qty))
            pos.append((
                po_id, _fmt("S", rng.randrange(1, 16), 4), pdate,
                round(total, 2),
                rng.choice(["Received"] * 8 + ["Pending", "Cancelled"]),
            ))
        month = _add_months(month, 1)
    out.tables["purchase_orders"] = pos
    out.tables["purchase_details"] = pds

    # ---- payments / book orders / sales details
    # (13_InsertSalesAndOrders.sql): daily orders ×1-6 lines, qty 1-4,
    # order-level discount valid on salesDate (trg_BookOrders_DiscDate);
    # line amounts per trg_salesdetails_calc_amounts
    # (02_Trigger.sql:412-455).
    payments, orders, sales = [], [], []
    pay_n, ord_n, sal_n = 0, 0, 0
    sprice_of = {t[0]: t[6] for t in titles}
    n_order_days = max(30, int(7305 * scale))
    for _ in range(n_order_days):
        sdate = _rnd_date(rng, DATA_START, DATA_END)
        for _ in range(rng.randrange(1, 3)):
            ord_n += 1
            pay_n += 1
            m = member_by_idx[rng.randrange(n_members)]
            valid = [d for d in discounts
                     if d[3] <= sdate <= d[4]] or [discounts[0]]
            disc = rng.choice(valid)
            order_id = _fmt("O", ord_n, 6)
            pay_id = _fmt("P", pay_n, 6)
            order_total = 0.0
            for _ in range(rng.randrange(1, 7)):
                sal_n += 1
                b_id = _fmt("B", rng.randrange(1, n_titles + 1), 4)
                qty = rng.randrange(1, 5)
                gross = round(sprice_of[b_id] * qty, 2)
                disc_amt = round(gross * disc[2] / 100.0, 2)
                line_total = round(gross - disc_amt, 2)
                order_total += line_total
                sales.append((_fmt("SD", sal_n, 6), order_id, b_id,
                              qty, disc_amt, line_total))
            payments.append((
                pay_id, m[0], sdate, round(order_total, 2),
                rng.choice(["Tng", "Cash", "Duitnow"]), "Book Sale",
                _fmt("R", pay_n, 8),
            ))
            orders.append((order_id, pay_id, disc[0], m[0], sdate))
    out.tables["book_orders"] = orders
    out.tables["sales_details"] = sales

    # ---- fines (08_InsertFines.sql + TRG_CALCULATE_FINE_AMOUNT
    # 02_Trigger.sql:199-224): Lost → price+20, Damage → price,
    # Late Return → 30; ≤2 fines per payment; paying marks Paid.
    fines = []
    fine_n = 0
    copy_book = {c[0]: c[1] for c in copies}
    unpaid_pool = []
    for b in borrows:
        (borrow_id, m_id, copy_id, bdate, due, ret, status, _) = b
        price = sprice_of[copy_book[copy_id]]
        kind = None
        if status == "Lost":
            kind, amt = "Lost Book", round(price + 20, 2)
        elif status == "Returned" and ret and ret > due:
            kind, amt = "Late Return", 30.0
        elif status == "Returned" and rng.random() < 0.03:
            kind, amt = "Damage", round(price, 2)
        if kind:
            fine_n += 1
            fines.append([_fmt("F", fine_n, 5), borrow_id, None, kind, amt,
                          (ret or due), "Unpaid"])
            unpaid_pool.append(fines[-1])
    # link ~60% of fines to payments, ≤2 per payment (08_InsertFines.sql)
    rng.shuffle(unpaid_pool)
    member_of_borrow = {b[0]: b[1] for b in borrows}
    i = 0
    while i < int(len(unpaid_pool) * 0.6):
        take = unpaid_pool[i:i + rng.randrange(1, 3)]
        pay_n += 1
        pay_id = _fmt("P", pay_n, 6)
        pay_amt = round(sum(f[4] for f in take), 2)
        pay_date = max(f[5] for f in take)
        m_id = member_of_borrow[take[0][1]]
        payments.append((pay_id, m_id, pay_date, pay_amt,
                         rng.choice(["Tng", "Cash", "Duitnow"]), "Fines",
                         _fmt("R", pay_n, 8)))
        for f in take:
            f[2] = pay_id
            f[6] = "Paid"  # TRG_MANAGE_PAYMENTS (02_Trigger.sql:278-297)
        i += len(take)
    # membership registration payments: amount 50
    # (TRG_CALCULATE_PAYMENT_AMOUNT, 02_Trigger.sql:227-246)
    for m in rng.sample(members, max(5, n_members // 4)):
        pay_n += 1
        payments.append((_fmt("P", pay_n, 6), m[0], m[8], 50.0,
                         rng.choice(["Tng", "Cash", "Duitnow"]),
                         "Membership Registration", _fmt("R", pay_n, 8)))
    out.tables["fines"] = [tuple(f) for f in fines]
    out.tables["payments"] = payments

    # ---- staff / shifts / schedules / attendance
    # (03_InsertStaffShift.sql; trg_auto_mark_late 02_Trigger.sql:104-123)
    roles = ["librarian", "manager", "assistant", "security", "cleaner"]
    staff = [(_fmt("ST", i, 2), f"{FIRSTS[i % 10]} {LASTS[i % 10]}",
              f"staff{i}@library.com", f"012-{i:07d}", roles[i % 5])
             for i in range(1, 12)]
    shifts = [(_fmt("SH", i, 2), f"Shift {i}",
               dt.datetime(2024, 1, 1, 8 + (i % 3) * 4, 0),
               dt.datetime(2024, 1, 1, 12 + (i % 3) * 4, 0))
              for i in range(1, 12)]
    schedules, attendance = [], []
    sched_n = 0
    for day in range(20):
        d = dt.date(2024, 5, 1) + dt.timedelta(days=day)
        if d.weekday() >= 5:
            continue
        for st in rng.sample(staff, 6):
            sched_n += 1
            sh = shifts[rng.randrange(11)]
            schedules.append((_fmt("SC", sched_n, 3), sh[0], st[0], d))
            start = dt.datetime.combine(d, sh[2].time())
            late_min = rng.choice([0, 0, 0, 0, rng.randrange(1, 40)])
            actual_start = start + dt.timedelta(minutes=late_min)
            status = "Late" if actual_start > start else "Present"
            attendance.append((
                _fmt("A", sched_n, 4), schedules[-1][0], status,
                actual_start,
                dt.datetime.combine(d, sh[3].time()),
            ))
    out.tables["staff"] = staff
    out.tables["shift"] = shifts
    out.tables["shift_schedules"] = schedules
    out.tables["staff_attendance"] = attendance

    return out
