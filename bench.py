"""Benchmark harness: runs EVERY registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The headline subset (QuerySpec.bench) keeps its own stable total —
``value`` stays comparable across rounds — while ``queries`` carries
per-query wall times for the full surface so per-query regressions
are visible round over round.
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
    # Wall-clock budget: the JSON line must be printed even under an
    # external timeout, so once the budget is spent the remaining
    # NON-headline work is skipped (headliners always run — they are
    # the cross-round comparable).
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "480"))
    t_begin = time.perf_counter()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = list(QUERIES.values())
    # Headliners first so a budget cut only ever drops breadth entries.
    specs.sort(key=lambda s: not s.bench)

    # Warm the JVM + parquet footers via the headline subset (the same
    # warm-up round 1 used, keeping the headline total comparable);
    # the rest of the registry is then timed single-run on the warm
    # session — a full double-run of all queries would double bench
    # wall time for no extra signal.
    for spec in specs:
        if spec.bench:
            spec.fn(spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    skipped: list[str] = []
    for spec in specs:
        if not spec.bench and time.perf_counter() - t_begin > budget:
            skipped.append(spec.name)
            continue
        start = time.perf_counter()
        spec.fn(spark, sf_dir).collect()
        timings[spec.name] = round(time.perf_counter() - start, 4)

    headline = round(sum(t for n, t in timings.items() if QUERIES[n].bench), 4)

    # Library-domain reports (LQY1-3) at the reference's designed
    # volumes (scale=1.0: 7.5k members / 200k borrows — BASELINE.md).
    # Guarded: a failure here must not cost the registry bench line.
    extra: dict[str, float] = {}
    try:
        if time.perf_counter() - t_begin > budget * 0.75:
            raise TimeoutError("bench budget spent before library section")
        from library_data_warehouse_and_business_analytics_system_spark.generators.library_data import (  # noqa: E501
            AS_OF, generate,
        )
        from library_data_warehouse_and_business_analytics_system_spark.plans.library import (  # noqa: E501
            initial_load, query1, query2, query3,
        )
        start = time.perf_counter()
        oltp = generate(seed=42, scale=1.0).to_spark(spark)
        dw = initial_load(spark, oltp, as_of=AS_OF)
        dw = {k: v.cache() for k, v in dw.items()}
        for df in dw.values():
            df.count()          # materialize the warehouse once
        extra["library_initial_load"] = round(time.perf_counter() - start, 4)
        for name, q in [("lqy_query1", query1), ("lqy_query2", query2),
                        ("lqy_query3", query3)]:
            start = time.perf_counter()
            q(dw, 2019, 2024).collect()
            extra[name] = round(time.perf_counter() - start, 4)
    except Exception as exc:  # pragma: no cover - defensive
        extra["library_bench_error"] = str(exc)[:200]

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": headline,
        "unit": "sec",
        "queries": {**timings, **{k: v for k, v in extra.items()
                                  if not k.endswith("_error")}},
        "all_queries_total": round(sum(timings.values()), 4),
        "n_queries": len(timings),
        "skipped": skipped,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
