"""library_etl section profile (r13 session 2): reproduce the bench's
timing exactly (generate -> to_spark -> initial_load -> cache+count
every warehouse table), broken into phases, 2 reps.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from library_data_warehouse_and_business_analytics_system_spark.generators.library_data import (  # noqa: E501
    AS_OF,
    generate,
)
from library_data_warehouse_and_business_analytics_system_spark.plans.library import (  # noqa: E501
    initial_load,
    query1,
    query2,
    query3,
)
from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E501
    get_spark,
)


def main() -> None:
    spark = get_spark("profile_library_etl")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    raw = generate(seed=42, scale=1.0)
    print(f"generate           {time.perf_counter() - t0:6.2f}s", flush=True)

    for rep in range(2):
        print(f"--- rep {rep}")
        t0 = time.perf_counter()
        oltp = raw.to_spark(spark)
        print(f"to_spark           {time.perf_counter() - t0:6.2f}s",
              flush=True)
        t0 = time.perf_counter()
        dw = initial_load(spark, oltp, as_of=AS_OF)
        dw = {k: v.cache() for k, v in dw.items()}
        print(f"plan build         {time.perf_counter() - t0:6.2f}s",
              flush=True)
        for name, df in dw.items():
            t0 = time.perf_counter()
            df.count()
            print(f"  count {name:16s} {time.perf_counter() - t0:6.2f}s",
                  flush=True)
        for name, q in [("lqy_query1", query1), ("lqy_query2", query2),
                        ("lqy_query3", query3)]:
            t0 = time.perf_counter()
            q(dw, 2019, 2024).collect()
            print(f"  {name:16s} {time.perf_counter() - t0:6.2f}s",
                  flush=True)
        for df in dw.values():
            df.unpersist()


if __name__ == "__main__":
    main()
