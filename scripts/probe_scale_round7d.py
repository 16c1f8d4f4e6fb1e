"""Scale-up probes for the round-7 session-4 additions:

1. ewma_scan at 1x / 8x / 64x ROWS (more keys AND longer series) —
   the two-phase range scan's cost must grow ~linearly; the driver
   carry chain is #blocks ≈ #partitions + #keys-straddling rows, so
   it must never dominate. Also: one HUGE key (the per-key
   single-reducer trap) at 1x vs 8x length — wall must grow ~linearly
   with the series, not quadratically, because the key's timeline
   spreads over every range partition it covers.
2. grouped two-phase rank (the MAD-outlier substrate) with 5 groups
   at 1x / 8x rows — a per-group window would serialize each group on
   one reducer; the range shape must scale with partitions instead.
3. item-item CF at 1x / 8x ORDERS with fixed basket size — pair
   fan-out is per-basket, so growth must stay ~linear.
4. cumsum_scan (vectorized) throughput: 1M and 8M rows across many
   keys, plus ONE 4M-point key — the per-key-window formulation
   would put the whole key on one reducer; the scan must spread it.

Prints one JSON line per probe. Run manually; results cited in
ROUND7.md.
    python scripts/probe_scale_round7d.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from library_data_warehouse_and_business_analytics_system_spark.operators.ranking import (  # noqa: E402
    with_group_rank,
)
from library_data_warehouse_and_business_analytics_system_spark.operators.timeseries import (  # noqa: E402
    cumsum_scan,
    ewma_scan,
)
from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E402
    get_spark,
)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = get_spark("probe-r7d")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}

    # --- 1a. ewma: keys × series grid ---------------------------------
    def series(n_keys: int, n_t: int):
        return (spark.range(n_keys * n_t)
                .select((F.col("id") % n_keys).cast("string").alias("k"),
                        (F.col("id") / n_keys).cast("long").alias("t"),
                        F.pmod(F.col("id") * 2654435761, 997)
                        .cast("double").alias("x")))

    grid = {}
    for mult, (nk, nt) in {"1x": (1_000, 100), "8x": (4_000, 200),
                           "64x": (16_000, 400)}.items():
        df = series(nk, nt)
        grid[mult] = _timed(
            lambda d=df: ewma_scan(d, "k", "t", "x").count())
    out["ewma_grid"] = grid

    # --- 1b. ewma: ONE key, growing series (the single-reducer trap) --
    one = {}
    for mult, nt in {"1x": 200_000, "8x": 1_600_000}.items():
        df = series(1, nt)
        one[mult] = _timed(
            lambda d=df: ewma_scan(d, "k", "t", "x").count())
    out["ewma_one_key"] = one

    # --- 2. grouped rank: 5 huge groups -------------------------------
    def grouped(n: int):
        return (spark.range(n)
                .select((F.col("id") % 5).cast("string").alias("g"),
                        F.pmod(F.col("id") * 2654435761, 1_000_003)
                        .cast("double").alias("x"),
                        F.col("id").alias("k")))

    gr = {}
    for mult, n in {"1x": 500_000, "8x": 4_000_000}.items():
        df = grouped(n)
        gr[mult] = _timed(
            lambda d=df: with_group_rank(
                d, ["g"], [F.col("x"), F.col("k")]).count())
    # reference: the naive per-group window at 1x, for the writeup
    df1 = grouped(500_000)
    w = Window.partitionBy("g").orderBy("x", "k")
    gr["naive_window_1x"] = _timed(
        lambda: df1.withColumn("r", F.row_number().over(w)).count())
    out["group_rank"] = gr

    # --- 3. item CF: orders grow, basket size fixed -------------------
    def baskets(n_orders: int, n_parts: int = 20_000, k: int = 6):
        return (spark.range(n_orders * k)
                .select((F.col("id") / k).cast("long").alias("o"),
                        F.pmod(F.col("id") * 40503
                               + (F.col("id") / k).cast("long"), n_parts)
                        .alias("p"))
                .distinct())

    def cf(bi):
        a, b = bi.alias("a"), bi.alias("b")
        co = (a.join(b, (F.col("a.o") == F.col("b.o"))
                     & (F.col("a.p") < F.col("b.p")))
              .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
              .agg(F.count(F.lit(1)).alias("n_co")))
        return co.count()

    cfres = {}
    for mult, n in {"1x": 100_000, "8x": 800_000}.items():
        bi = baskets(n)
        cfres[mult] = _timed(lambda b=bi: cf(b))
    out["item_cf_pairs"] = cfres

    # --- 4. cumsum_scan throughput (vectorized Arrow passes) ----------
    cs = {}
    for label, (nk, nt) in {"1M": (10_000, 100), "8M": (20_000, 400),
                            "one_key_4M": (1, 4_000_000)}.items():
        df = series(nk, nt) if nk > 1 else series(1, nt)
        cs[label] = _timed(
            lambda d=df: cumsum_scan(d, "k", "t", "x").count())
    out["cumsum_scan"] = cs

    print(json.dumps(out))


if __name__ == "__main__":
    main()
