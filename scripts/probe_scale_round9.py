"""Round-9 scale probe for the scan family's mode="split" escape
hatch (the r8 verdict's item 7 — the documented dead zone: numerous
keys AND one oversized key).

Shape: one 10M-point hot key among 100k two-row keys (10.2M rows).
- "grouped" would put the hot key's whole series on ONE partition
  (the thing split exists to prevent);
- "ranged" would collect O(100k) per-key block summaries to the
  driver and broadcast a 100k-entry carry map;
- "split" pays one exact count pass, routes the hot key through the
  ranged carry machinery (range-split across all partitions, carry
  state O(1 key x #partitions)) and the 100k tail through grouped
  (zero driver state).

Probes, each timed end-to-end (count() materialization):
1. split on the mixed shape (ewma + cumsum);
2. grouped on the TAIL alone (the baseline split must stay near —
   its extra cost is the count pass + the hot key's ranged scan);
3. the hot key's max per-partition row load under split's ranged
   layout (must be ~10M/#partitions, not 10M).

Prints one JSON line per probe. Run manually; results cited in
ROUND9.md.
    python scripts/probe_scale_round9.py
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
    _base_frame,
    _ranged_layout,
    _split_oversized,
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
    spark = get_spark("probe-r9")
    spark.sparkContext.setLogLevel("ERROR")
    parts = 32

    n_hot, n_tail = 10_000_000, 100_000
    hot = spark.range(n_hot).select(
        F.lit("hot").alias("k"), F.col("id").cast("int").alias("t"),
        (F.col("id") % 97).cast("double").alias("x"))
    tail = spark.range(n_tail * 2).select(
        (F.col("id") % n_tail).cast("string").alias("k"),
        (F.col("id") / n_tail).cast("int").alias("t"),
        F.lit(2.0).alias("x"))
    df = hot.unionByName(tail).localCheckpoint()
    tail_only = tail.localCheckpoint()

    print(json.dumps({
        "probe": "split_mixed_ewma",
        "rows": n_hot + 2 * n_tail, "keys": n_tail + 1,
        "sec": _timed(lambda: ewma_scan(
            df, "k", "t", "x", alpha=0.3, n_partitions=parts,
            mode="split").count()),
    }), flush=True)
    print(json.dumps({
        "probe": "split_mixed_cumsum",
        "sec": _timed(lambda: cumsum_scan(
            df, "k", "t", "x", n_partitions=parts,
            mode="split").count()),
    }), flush=True)
    print(json.dumps({
        "probe": "grouped_tail_baseline",
        "rows": 2 * n_tail,
        "sec": _timed(lambda: ewma_scan(
            tail_only, "k", "t", "x", alpha=0.3, n_partitions=parts,
            mode="grouped").count()),
    }), flush=True)

    hot_df, _ = _split_oversized(df, "k", 2_000_000)
    layout = _ranged_layout(_base_frame(hot_df, "k", "t", "x"), parts)
    per_part = [r["c"] for r in layout.groupBy(F.spark_partition_id())
                .agg(F.count("*").alias("c")).collect()]
    print(json.dumps({
        "probe": "split_hot_partition_load",
        "max_rows_per_partition": max(per_part),
        "ideal": n_hot // parts,
        "n_partitions_used": len(per_part),
    }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
