"""Round-14 measurement harness (guide §1): isolate each query with the
noop sink, label jobs, capture explain("formatted") into
plans/r14/<name>_<tag>.txt, and record the Spark JOB COUNT per query
(deterministic under host contention — the r13 lesson).

Usage: python scripts/measure_r14.py <tag> [name ...]
With no names, measures the heavy set below.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from library_data_warehouse_and_business_analytics_system_spark.plans import QUERIES
from library_data_warehouse_and_business_analytics_system_spark.session import get_spark

HEAVY = [
    "library_etl_section", "ann_index_full_cycle", "copurchase_pagerank",
    "item_cf_similar_parts", "merge_parts_orders", "incremental_agg_orders",
    "dedup_canonical_keep",
    "exact_substring_scrub", "self_repeat_scrub", "dedup_kept_corpus",
    "incremental_minmax_orders", "bloom_point_lookup", "bucketed_join_revenue",
    "ann_index_lifecycle", "ann_index_reroute", "ann_index_pruned_probe",
    "copurchase_triangles", "ngram_jaccard_dups",
]


def _job_count(spark) -> int:
    v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return v if isinstance(v, int) else v.get()


def measure_library_etl(spark, tag: str, plans_dir: Path) -> dict[str, float]:
    """The bench's library_etl section (to_spark + initial_load +
    cache&count), timed with the bench's own method."""
    from library_data_warehouse_and_business_analytics_system_spark.generators.library_data import (  # noqa: E501
        AS_OF, generate,
    )
    from library_data_warehouse_and_business_analytics_system_spark.plans.library import (  # noqa: E501
        initial_load,
    )
    raw = generate(seed=42, scale=1.0)
    out = {}
    for rep in range(3):
        spark.sparkContext.setJobDescription(f"r14 {tag}: library_etl r{rep}")
        j0 = _job_count(spark)
        t0 = time.perf_counter()
        oltp = raw.to_spark(spark)
        dw = initial_load(spark, oltp, as_of=AS_OF)
        dw = {k: v.cache() for k, v in dw.items()}
        for df in dw.values():
            df.count()
        dt = time.perf_counter() - t0
        jobs = _job_count(spark) - j0
        out[f"library_etl_r{rep}"] = round(dt, 3)
        print(f"library_etl rep{rep}  {dt:7.2f}s  jobs={jobs}", flush=True)
        for df in dw.values():
            df.unpersist()
    return out


def main() -> None:
    import os
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEAVY
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure_r14")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    jobs_out: dict[str, int] = {}
    plans_dir = REPO / "plans" / "r14"
    plans_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        if name == "library_etl_section":
            out.update(measure_library_etl(spark, tag, plans_dir))
            continue
        spec = QUERIES[name]
        spark.sparkContext.setJobDescription(f"r14 warm: {name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()   # warm
        warm = time.perf_counter() - t0
        try:
            (plans_dir / f"{name}_{tag}.txt").write_text(
                df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        except Exception:
            (plans_dir / f"{name}_{tag}.txt").write_text("explain failed")
        spark.sparkContext.setJobDescription(f"r14 timed: {name}")
        j0 = _job_count(spark)
        t0 = time.perf_counter()
        df2 = spec.fn(spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        out[name] = round(dt, 3)
        jobs_out[name] = _job_count(spark) - j0
        print(f"{name:32s} warm={warm:7.2f}s timed={dt:7.2f}s "
              f"jobs={jobs_out[name]}", flush=True)
    print(json.dumps(out))
    (plans_dir / f"timings_{tag}.json").write_text(
        json.dumps({"sec": out, "jobs": jobs_out}, indent=1))


if __name__ == "__main__":
    main()
