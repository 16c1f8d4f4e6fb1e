"""Round-11 scale probe: the SRP hot-bucket bound on a SKEWED corpus.

The r10 verdict's one scale-killer candidate: ``srp_candidate_ids``'s
bucket join has pair set Σ_buckets |A_b|x|B_b|, so a dense
near-duplicate cluster (exactly what a dedup-adjacent pipeline sees)
blows one bucket to O(n²). This probe plants such a cluster at the
100k-per-side scale of the r10 bitext probe and measures the
candidate count and wall with and without ``bucket_cap``:

- corpus: 100k x 100k 64-d fract-sin-hash vectors (the
  probe_scale_round10b construction), PLUS a 5k-copy near-identical
  cluster on EACH side (tiny jitter around one direction) — uncapped,
  that cluster alone contributes ~25M pairs per table before dedup;
- 1,000 planted DISTINCT near-pairs (a[i] ~ b[i]) as the recall set;
- measure: candidate count + wall, uncapped vs bucket_cap=256, and
  planted-pair coverage of the capped candidate set (structural
  recall: planted pairs share every table's bucket, so they survive
  iff both endpoints survive the per-table sample in some table).

Run:  python scripts/probe_scale_round11.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from library_data_warehouse_and_business_analytics_system_spark.operators.bitext import (  # noqa: E402,E501
    srp_candidate_ids,
)
from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E402,E501
    get_spark,
)

N, DIM = 100_000, 64
N_CLUSTER = 5_000
N_PLANTED = 1_000
PLANES, TABLES = 12, 4
CAP = 256


def synth(spark, side: str, offset: int):
    """Deterministic pseudo-random vectors via the fract-sin hash
    (periodic-trap note in scripts/probe_scale_round10.py); rows
    [0, N_CLUSTER) collapse onto one jittered direction (the skew
    cluster), rows [N_CLUSTER, N_CLUSTER+N_PLANTED) of side b copy
    side a's direction per-id (the planted distinct pairs)."""
    base = spark.range(N).select(
        (F.col("id") + F.lit(offset)).alias("seed_id"),
        F.col("id").alias("vec_id"))
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (F.sin(F.col("seed_id") * 12.9898 + j * 78.233)
                   * 43758.5453) % 1.0)
    # cluster rows: one fixed direction + id-scaled jitter on coord 1
    clustered = F.when(
        F.col("vec_id") < N_CLUSTER,
        F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda j: F.when(j == 0, F.lit(1.0)).otherwise(
                        F.col("vec_id") * 1e-9 + j * 0.0))
    ).otherwise(comp)
    return base.select("vec_id", clustered.alias("embedding"))


def main() -> None:
    spark = get_spark("probe-r11")
    spark.sparkContext.setLogLevel("ERROR")

    a = synth(spark, "a", 0)
    # side b: planted ids [N_CLUSTER, N_CLUSTER+N_PLANTED) reuse side
    # a's seed (same vector => shares every bucket); everything else
    # gets an independent seed space
    b_seed = F.when(
        (F.col("id") >= N_CLUSTER) & (F.col("id") < N_CLUSTER + N_PLANTED),
        F.col("id")).otherwise(F.col("id") + F.lit(10_000_000))
    b = spark.range(N).select(b_seed.alias("seed_id"),
                              F.col("id").alias("vec_id"))
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (F.sin(F.col("seed_id") * 12.9898 + j * 78.233)
                   * 43758.5453) % 1.0)
    clustered = F.when(
        F.col("vec_id") < N_CLUSTER,
        F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda j: F.when(j == 0, F.lit(1.0)).otherwise(
                        F.col("vec_id") * 1e-9 + j * 0.0))
    ).otherwise(comp)
    b = b.select("vec_id", clustered.alias("embedding"))

    for cap in (None, CAP):
        t0 = time.perf_counter()
        cand = srp_candidate_ids(a, b, dim=DIM, n_planes=PLANES,
                                 n_tables=TABLES, seed=9, bucket_cap=cap)
        n = cand.count()
        wall = time.perf_counter() - t0
        planted = cand.filter(
            (F.col("src_id") >= N_CLUSTER)
            & (F.col("src_id") < N_CLUSTER + N_PLANTED)
            & (F.col("tgt_id") == F.col("src_id"))).count()
        print(f"bucket_cap={cap}: candidates={n:,} wall={wall:.1f}s "
              f"planted_covered={planted}/{N_PLANTED}", flush=True)


if __name__ == "__main__":
    main()
