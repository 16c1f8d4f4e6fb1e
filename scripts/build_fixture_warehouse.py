"""Build the committed library-warehouse fixture the LQY gate queries
read (fixtures/library_dw/).

The three LQY flagship reports (plans/library/reports.py, mirroring
/root/reference/LQY_query{1,2,3}.txt) run on the star-schema warehouse,
not on the driver's TPC-ish parquet — so gating them through the
driver's DuckDB oracle needs a warehouse both engines can read from
disk. This script materializes the same seeded generator + initial_load
pipeline the pytest fixtures use (tests/test_library_etl.py) and writes
each table as a single-file parquet dataset. Run once; the output is
committed, so the gate never depends on generator/ETL determinism at
verify time.

Usage: python scripts/build_fixture_warehouse.py
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from library_data_warehouse_and_business_analytics_system_spark.generators.library_data import (  # noqa: E402
    AS_OF, generate,
)
from library_data_warehouse_and_business_analytics_system_spark.plans.library import (  # noqa: E402
    initial_load,
)
from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E402
    get_spark,
)

OUT = REPO / "fixtures" / "library_dw"

#: Same seed/scale as the pytest module fixture — big enough that every
#: report branch (all quarters, several states/genres, QoQ windows) has
#: data, small enough to commit (~1 MB total).
SEED, SCALE = 42, 0.02


def main() -> None:
    spark = get_spark("build-fixture-warehouse", shuffle_partitions=8)
    oltp = generate(seed=SEED, scale=SCALE).to_spark(spark)
    dw = initial_load(spark, oltp, as_of=AS_OF)
    OUT.mkdir(parents=True, exist_ok=True)
    for name, df in dw.items():
        path = OUT / f"{name}.parquet"
        df.coalesce(1).write.mode("overwrite").parquet(str(path))
        n = spark.read.parquet(str(path)).count()
        print(f"{name}: {n} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
