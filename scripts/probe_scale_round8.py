"""Round-8 scale probes for the scan-family changes:

1. ewma_scan / holt_scan vectorized throughput (the r7 verdict's two
   weak marks): 8M rows over 20k keys and a single 4M-point key —
   the same grid e123837 measured for cumsum_scan after its
   vectorization. The chunked rescaled-cumsum (EWMA) and complex
   eigen-channel (Holt) Arrow passes should land in the same
   ~seconds-per-8M-rows band as the vectorized cumsum, ~50x the old
   per-row Python loop.
2. Cardinality dispatch: cumsum_scan over 2M rows x 1M DISTINCT keys
   in auto mode (dispatches to "grouped": no summaries collect, no
   carry broadcast — the shape that OOMs the ranged carry) vs the
   same data forced through "ranged" at a small scale to show the
   carry cost growing with keys.

Prints one JSON line per probe. Run manually; results cited in
ROUND8.md.
    python scripts/probe_scale_round8.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from library_data_warehouse_and_business_analytics_system_spark.operators.timeseries import (  # noqa: E402
    cumsum_scan,
    ewma_scan,
    holt_scan,
)
from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E402
    get_spark,
)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = get_spark("probe-r8")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}

    # --- 1. vectorized EWMA / Holt throughput -------------------------
    def series(n_rows: int, n_keys: int):
        return (spark.range(n_rows)
                .select((F.col("id") % n_keys).cast("string").alias("k"),
                        (F.col("id") / n_keys).cast("long").alias("t"),
                        (F.col("id") % 1013).cast("double").alias("x"))
                .localCheckpoint())

    wide = series(8_000_000, 20_000)       # 400-point keys
    one_key = series(4_000_000, 1)         # a single 4M-point key
    out["ewma_8m_rows_20k_keys"] = {"sec": _timed(
        lambda: ewma_scan(wide, "k", "t", "x", alpha=0.3,
                          mode="ranged").count())}
    out["ewma_one_4m_point_key"] = {"sec": _timed(
        lambda: ewma_scan(one_key, "k", "t", "x", alpha=0.3,
                          mode="ranged").count())}
    out["holt_8m_rows_20k_keys"] = {"sec": _timed(
        lambda: holt_scan(wide, "k", "t", "x", alpha=0.5, gamma=0.5,
                          mode="ranged").count())}
    out["holt_one_4m_point_key"] = {"sec": _timed(
        lambda: holt_scan(one_key, "k", "t", "x", alpha=0.5, gamma=0.5,
                          mode="ranged").count())}
    out["cumsum_8m_rows_20k_keys"] = {"sec": _timed(
        lambda: cumsum_scan(wide, "k", "t", "x",
                            mode="ranged").count())}

    # --- 2. cardinality dispatch: 1M distinct keys --------------------
    many = series(2_000_000, 1_000_000)    # 2-point keys
    out["cumsum_2m_rows_1m_keys_auto_grouped"] = {"sec": _timed(
        lambda: cumsum_scan(many, "k", "t", "x", mode="auto").count())}
    # ranged on the same data: the carry chain collects ~1M block
    # summaries and broadcasts a ~1M-entry dict — measurably worse
    # already at local scale, fatal at cluster scale.
    out["cumsum_2m_rows_1m_keys_forced_ranged"] = {"sec": _timed(
        lambda: cumsum_scan(many, "k", "t", "x", mode="ranged").count())}

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
