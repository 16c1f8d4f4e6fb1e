"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the same config block is what we
would ship to a real cluster (AQE on, adaptive skew-join, sensible
shuffle parallelism). Nothing here is local-mode-specific except the
master URL, which callers override in production.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that matter at 100 TB just as much as at sf0.01.
ENGINE_CONFS: dict[str, str] = {
    # Adaptive query execution: runtime re-plan, skew-join splitting,
    # partition coalescing — essential on real data distributions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas boundary crossing.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics regardless of host tz.
    "spark.sql.session.timeZone": "UTC",
    # Exact decimal arithmetic for money (Oracle NUMBER parity,
    # SURVEY.md §4.4).
    "spark.sql.decimalOperations.allowPrecisionLoss": "false",
    # Partition sizing: at 100 TB this is the lever that keeps a scan
    # task's input ~128MB; harmless locally.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # InferFiltersFromGenerate rewrites explode(expr) into
    # Filter(size(expr) > 0) + explode(expr) and FilterPushdown then
    # inlines the FULL generator-input expression into that filter —
    # for our derived-array explodes (shingle/window-hash/band
    # tensors, all interpreted HOF trees) every scan row paid the
    # whole tokenize+hash subtree TWICE (r13; guide §7.2 "duplicated
    # subtrees"; measured at sf0.1: the shingle explode 3.0 s →
    # 0.44 s, minhash pair gate 4.8 s → 2.3 s, outputs identical).
    # Excluding the rule is semantics-free for this engine: a
    # non-outer explode drops empty/NULL arrays itself in the SAME
    # stage, so the inferred filter saves no shuffle bytes here —
    # none of our generates sit above a join/exchange the filter
    # could have pruned. The cost duplication grows with document
    # size, so at 100 TB this is a 2× on every text-pipeline scan
    # stage, not a local-mode artifact.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
}


import contextlib


@contextlib.contextmanager
def no_aqe(spark: SparkSession):
    """Temporarily disable AQE so an eager ``localCheckpoint`` records
    its physical ``hashpartitioning``/sort order into the LogicalRDD
    leaf (r14, guide §2.4): under AQE the final partitioning is only
    known post-execution and Spark stamps UnknownPartitioning, so
    every downstream join/aggregate re-exchanged (and re-sorted) the
    checkpointed frame. With the partitioning preserved, an iterative
    fixpoint's per-round join reuses the one exchange the checkpoint
    already paid. Scope the toggle to the checkpoint's own
    materialization — everything else still runs under AQE. This is
    partition PLACEMENT only; row values are unchanged at any scale."""
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def get_spark(app_name: str = "library-dwh-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for local runs;
    pass ``None`` in a cluster deployment where spark-submit sets it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus))
    )
    builder = builder.config("spark.driver.memory",
                             os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    builder = builder.config("spark.ui.enabled", "false")
    return builder.getOrCreate()
