"""Shared expression library (SURVEY.md §7 step 2): every scalar
derivation rule of the reference as a pure Column expression — zero
UDFs, so everything stays inside whole-stage codegen.

Each function cites the reference rule it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fmt_id(prefix: str, n: Column, width: int) -> Column:
    """``'PO' || LPAD(n, width, '0')`` — ID formatter
    (01_helpers.sql:48-53)."""
    return F.concat(F.lit(prefix), F.lpad(n.cast("string"), width, "0"))


def age_band(age: Column) -> Column:
    """Age banding incl. the 100/NULL → UNKNOWN rule
    (05_InitialLoading.sql:237-246)."""
    return (
        F.when(age.isNull() | (age == 100), "UNKNOWN")
        .when(age < 18, "BELOW 18")
        .when(age.between(18, 25), "18 TO 25")
        .when(age.between(26, 40), "26 TO 40")
        .when(age.between(41, 55), "41 TO 55")
        .when(age.between(56, 70), "56 TO 70")
        .when(age >= 71, "71+")
        .otherwise("UNKNOWN")
    )


def gender_norm(gender: Column) -> Column:
    """female→F, male→M, else U (05_InitialLoading.sql:249-253)."""
    g = F.lower(F.trim(gender))
    return F.when(g == "female", "F").when(g == "male", "M").otherwise("U")


def _part_from_right(addr: Column, k: int) -> Column:
    """k-th comma-separated part counting from the right (1-based),
    uppercased+trimmed, or 'UNKNOWN' when the address has too few
    commas. Clean split/element_at equivalent of the reference's
    INSTR(addr, ',', -1, k)+SUBSTR arithmetic
    (05_InitialLoading.sql:256-277)."""
    parts = F.split(addr, ",")
    # Oracle's rule demands the part be BETWEEN two commas: the ref
    # guards on INSTR(addr,',',-1,k+1) > 0, i.e. k+1 commas → k+2
    # parts ('City, Malaysia' has no state and yields UNKNOWN).
    return F.when(
        F.size(parts) > k + 1,
        F.upper(F.trim(F.element_at(parts, -(k + 1)))),
    ).otherwise("UNKNOWN")


def member_state(addr: Column) -> Column:
    """State = text between 2nd-last and last comma
    (05_InitialLoading.sql:256-265)."""
    return _part_from_right(addr, 1)


def member_city(addr: Column) -> Column:
    """City = text between 3rd-last and 2nd-last comma
    (05_InitialLoading.sql:267-277)."""
    return _part_from_right(addr, 2)


def supplier_state(addr: Column) -> Column:
    """Supplier state = between 3rd-last and 2nd-last comma
    (05_InitialLoading.sql:302-308)."""
    return _part_from_right(addr, 2)


def supplier_city(addr: Column) -> Column:
    """Supplier city = between 4th-last and 3rd-last comma
    (05_InitialLoading.sql:309-315)."""
    return _part_from_right(addr, 3)


def nonneg_money(x: Column) -> Column:
    """``ROUND(GREATEST(COALESCE(x,0),0),2)``
    (05_InitialLoading.sql:218, 07_SubsequentLoading.sql:15-19)."""
    return F.round(F.greatest(F.coalesce(x, F.lit(0)), F.lit(0)), 2)


def norm_popularity(p: Column) -> Column:
    """Clamp popularity to [0,5], NULL→3.0
    (07_SubsequentLoading.sql:9-13, 05_InitialLoading.sql:219)."""
    return F.least(F.greatest(F.coalesce(p, F.lit(3.0)), F.lit(0.0)), F.lit(5.0))


def canonical_genre(genre: Column) -> Column:
    """Genre canonicalization: NONFICTION variants → 'NON-FICTION',
    plus UPPER/TRIM standardization (07_SubsequentLoading.sql:21-24,
    dirty variants seeded by 04_InsertBookTitles.sql:8-13 incl.
    'HIstory' typo)."""
    g = F.upper(F.trim(genre))
    g = F.regexp_replace(g, r"^NON[ -]?FICTION$", "NON-FICTION")
    return g


def state_norm(state: Column) -> Column:
    """``UPPER(NVL(NULLIF(TRIM(state),''),'UNKNOWN'))``
    (LQY_query3.txt:83)."""
    return F.upper(F.coalesce(F.nullif(F.trim(state), F.lit("")), F.lit("UNKNOWN")))


def member_duration_text(registration: Column, as_of: Column) -> Column:
    """``ROUND(MONTHS_BETWEEN(as_of, reg)/12, 1) || ' years'``
    (05_InitialLoading.sql:280-285). ``as_of`` replaces SYSDATE so
    the measure is reproducible (SURVEY.md §7 risk 1)."""
    years = F.round(F.months_between(as_of, registration) / 12.0, 1)
    return F.concat(years.cast("string"), F.lit(" years"))


def quarter_tag(d: Column) -> Column:
    """``'Q' || quarter`` → 'Q1'..'Q4' (05_InitialLoading.sql:184)."""
    return F.concat(F.lit("Q"), F.quarter(d).cast("string"))


def expiry_after_renewals(reg: Column, renewals: Column) -> Column:
    """``ADD_MONTHS(reg, 12*(1+k)) - 1 day``
    (02_InsertMembers.sql:39-43)."""
    return F.date_sub(F.add_months(reg, (F.lit(1) + renewals) * 12), 1)
