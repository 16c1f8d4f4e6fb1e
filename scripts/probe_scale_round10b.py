"""Round-10 scale probe for margin-based bitext mining
(operators/bitext.py) on its 100 TB posture: SRP-bucketed candidates
feeding margin_mine, at a corpus size where the brute A×B pair set
(1e10 pairs) is out of the question.

Shape: 100k × 100k synthetic 64-d vectors (the fract-sin hash from
probe_scale_round10.py — decorrelated across ids), with 1,000 planted
near-identical cross-side pairs (the "parallel sentences"). Planted
pairs share every SRP bucket, so candidate recall on them is
structural; the probe measures:

1. candidate generation (hash + bucket join + id-pair dedup) — count
   and wall; the count is the thing that decides 100× survival:
   Σ_buckets |A_b|×|B_b|, never |A|×|B|;
2. the margin mine over the candidates — wall, mined count, and the
   max candidates-per-src (the per-window partition bound: no reducer
   serializes when this is bounded);
3. planted-pair recovery: fraction of the 1,000 planted src ids whose
   mined top-1 is their true partner.

Prints one JSON line per probe. Run manually; results cited in
ROUND10.md.
    python scripts/probe_scale_round10b.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from library_data_warehouse_and_business_analytics_system_spark.operators.bitext import (  # noqa: E402
    margin_mine,
    srp_candidate_ids,
    srp_candidate_pairs,
)
from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E402
    get_spark,
)

N, DIM, PLANTED = 100_000, 64, 1_000
N_PLANES, N_TABLES = 12, 4


def _vectors(spark, n, salt, id_start=0):
    ids = spark.range(id_start, id_start + n).select(
        F.col("id").alias("vec_id"))
    coords = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (lambda x: x - F.floor(x))(
            F.sin(F.col("vec_id") * 12.9898
                  + j.cast("double") * 78.233 + salt) * 43758.5453) - 0.5)
    return ids.select("vec_id", coords.alias("embedding"))


def main() -> None:
    spark = get_spark("probe-r10b")
    spark.sparkContext.setLogLevel("ERROR")

    a = _vectors(spark, N, salt=0.0).cache()
    # side B: independent vectors, EXCEPT the first PLANTED ids copy
    # side A's vector with a tiny deterministic perturbation — the
    # planted parallel pairs (b_id = a_id + 1_000_000)
    b_rand = _vectors(spark, N, salt=3.7, id_start=1_000_000)
    b_plant = (_vectors(spark, PLANTED, salt=0.0)
               .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                       F.transform("embedding",
                                   lambda x: x * 1.0001 + 0.0003)
                       .alias("embedding")))
    b = (b_rand.join(b_plant.select("vec_id"), "vec_id", "left_anti")
         .unionByName(b_plant).cache())
    a.count(), b.count()

    t0 = time.perf_counter()
    # pin the ID pairs only (16 bytes/candidate); the vector-carrying
    # frame stays lazy — margin_mine's chained lineage evaluates it once
    cand = srp_candidate_ids(a, b, dim=DIM, n_planes=N_PLANES,
                             n_tables=N_TABLES, seed=7).localCheckpoint()
    n_cand = cand.count()
    t_cand = round(time.perf_counter() - t0, 2)
    planted_cand = cand.where(
        (F.col("src_id") < PLANTED)
        & (F.col("tgt_id") - F.lit(1_000_000) == F.col("src_id"))).count()
    max_per_src = (cand.groupBy("src_id").count()
                   .agg(F.max("count")).collect()[0][0])
    pairs = srp_candidate_pairs(a, b, dim=DIM, cand_ids=cand)
    print(json.dumps({
        "probe": "candidates", "n_per_side": N, "planes": N_PLANES,
        "tables": N_TABLES, "sec": t_cand, "n_candidates": n_cand,
        "frac_of_brute": round(n_cand / (N * N), 6),
        "planted_covered": planted_cand, "max_cand_per_src": max_per_src}))

    t0 = time.perf_counter()
    mined = margin_mine(a, b, k=4, threshold=1.0, pairs=pairs,
                        pin_scored=True)
    hits = (mined.where(
        (F.col("src_id") < PLANTED)
        & (F.col("tgt_id") - F.lit(1_000_000) == F.col("src_id")))
        .count())
    n_mined = mined.count()
    t_mine = round(time.perf_counter() - t0, 2)
    print(json.dumps({
        "probe": "margin_mine", "sec": t_mine, "n_mined": n_mined,
        "planted_recovered": hits,
        "planted_recall": round(hits / PLANTED, 3)}))


if __name__ == "__main__":
    main()
