"""Seeded LQY1-3 parameter sweep vs the DuckDB reference
translations, shared by the scale-0.02 gate-warehouse test
(test_library_etl.py) and the reference-volume run
(test_reference_scale.py). One sweep = ``3 * rounds`` tuples drawn
from the warehouse's own value domains (year ranges, limits / topn /
coverage, gender, supplier-CSV and state-CSV branches); every
non-empty result must match the translation exactly
(r11 verdict item 6 / r12 verdict item 3)."""

from __future__ import annotations

import random

from library_data_warehouse_and_business_analytics_system_spark.plans.library import (
    query1, query2, query3,
)
from library_data_warehouse_and_business_analytics_system_spark.plans.library_gate import (
    Q1_SQL, Q2_SQL, Q3_SQL,
)

from .helpers import assert_frames_match


def run_lqy_sweep(dw, con, seed: int = 1212, rounds: int = 7,
                  float_rtol: float = 1e-9) -> tuple[int, int]:
    """Push ``3 * rounds`` seeded parameter tuples through
    query1/2/3 against ``dw`` (Spark warehouse dict) and the DuckDB
    connection ``con`` holding the SAME warehouse as views. Returns
    ``(live, total)`` where live counts tuples with a non-empty,
    exactly-matching result; raises AssertionError on any mismatch."""
    rng = random.Random(seed)
    states = sorted({r.state.strip() for r in
                     dw["dim_members"].select("state").distinct().collect()
                     if r.state and r.state.strip()})
    sups = sorted({r.supplierName for r in
                   dw["dim_suppliers"].select("supplierName")
                   .distinct().collect() if r.supplierName})
    assert states and sups

    def years(lo=2015, hi=2024):
        yf = rng.randint(lo, hi - 1)
        return yf, rng.randint(yf, hi)

    def quote_upper(names):
        return ",".join("'" + n.upper().replace("'", "''") + "'"
                        for n in names)

    live = 0
    for _ in range(rounds):
        yf, yt = years()
        g = rng.choice(["ALL", "F", "M"])
        lim = rng.randint(1, 8)
        tag = f"q1[{yf},{yt},{g},{lim}]"
        got = query1(dw, yf, yt, limit=lim, gender=g).toPandas()
        exp = con.execute(Q1_SQL.format(yf=yf, yt=yt, g=g, lim=lim)).df()
        if len(got) == 0 and len(exp) == 0:
            continue
        assert_frames_match(got, exp, tag, float_rtol=float_rtol)
        live += 1

    for _ in range(rounds):
        yf, yt = years()
        topn = rng.randint(1, 12)
        if rng.random() < 0.5:
            sel = rng.sample(sups, k=min(len(sups), rng.randint(1, 4)))
            csv = ",".join(sel)
            sup_sql = f"UPPER(s.supplierName) IN ({quote_upper(sel)})"
        else:
            csv, sup_sql = "%", "1=1"
        tag = f"q2[{yf},{yt},{topn},{csv[:40]}]"
        got = query2(dw, yf, yt, topn=topn, suppliers_csv=csv).toPandas()
        exp = con.execute(
            Q2_SQL.format(yf=yf, yt=yt, topn=topn, sup=sup_sql)).df()
        if len(got) == 0 and len(exp) == 0:
            continue
        assert_frames_match(got, exp, tag, float_rtol=float_rtol)
        live += 1

    for _ in range(rounds):
        yf, yt = years()
        cov = rng.choice([5, 10, 15, 20, 25])
        if rng.random() < 0.5:
            sel = rng.sample(states, k=min(len(states), rng.randint(1, 4)))
            csv = ",".join(sel)
            sp = f"state IN ({quote_upper(sel)})"
        else:
            csv, sp = "%", "1=1"
        tag = f"q3[{yf},{yt},{cov},{csv[:40]}]"
        got = query3(dw, yf, yt, states_csv=csv,
                     target_gm_pct=float(cov)).toPandas()
        exp = con.execute(
            Q3_SQL.format(yf=yf, yt=yt, cov=cov, sp=sp)).df()
        if len(got) == 0 and len(exp) == 0:
            continue
        assert_frames_match(got, exp, tag, float_rtol=float_rtol)
        live += 1

    return live, 3 * rounds
