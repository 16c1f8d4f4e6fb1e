"""Driver-faithful dry-run of the current 50-row gate window.

    python scripts/window_dry_run.py [sf_dir] [n]

Mirrors the driver's CORRECTNESS gate as closely as we can observe it:
a VANILLA SparkSession (the driver controls the session, not our tuned
builder), DuckDB views over the same parquet, and the type-faithful
sorted-frame exact compare from tests/helpers.py (which, since r10,
fails int-vs-float dtype-kind mismatches the way the driver's
type-sensitive hash does). Prints one line per window query and a
summary; exit code 1 on any failure.
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from library_data_warehouse_and_business_analytics_system_spark.plans import QUERIES  # noqa: E402
from tests.helpers import assert_frames_match  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    window = list(QUERIES)[:n]
    failures = []
    for i, name in enumerate(window, 1):
        spec = QUERIES[name]
        t0 = time.perf_counter()
        try:
            got = spec.fn(spark, sf_dir).toPandas()
            want = con.execute(spec.oracle).df()
            assert_frames_match(got, want, name)
            print(f"  [{i:2d}/{n}] {name}: OK "
                  f"({len(got)} rows, {time.perf_counter() - t0:.1f}s)")
        except Exception:
            failures.append(name)
            print(f"  [{i:2d}/{n}] {name}: FAIL")
            traceback.print_exc(limit=3)
    print(f"\n{n - len(failures)}/{n} green" +
          (f"; FAILURES: {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
