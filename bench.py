"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from library_data_warehouse_and_business_analytics_system_spark.plans import QUERIES
from library_data_warehouse_and_business_analytics_system_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_specs = [s for s in QUERIES.values() if s.bench]

    # Warm the JVM + parquet footers once so we measure query time,
    # not session startup.
    for spec in bench_specs:
        spec.fn(spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    for spec in bench_specs:
        start = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.collect()
        timings[spec.name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
