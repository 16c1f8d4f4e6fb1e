"""Scale-up probes for the round-7 changes:

1. familiarity scoring with the SHUFFLED vocabulary join (the forced
   broadcast removed this round) — wall time between 8x and 64x
   replicated corpora should grow ~linearly in rows, not explode;
2. boilerplate removal with the shuffled anti-join — same contract;
3. probe cost against the band index after 30 daily appends vs after
   maintain_index compaction — maintenance must not slow the probe
   (it should help: 30+ dir listings collapse to one generation);
4. tx_merge_parts with a FIXED single-partition delta into a table 8x
   larger (8x the partitions) — merge wall time must stay ~flat,
   because only the touched partition is read and rewritten (the
   whole-table tx_merge this replaces scales with the table).

Replicates the sf0.1 documents table in memory with disjoint ids (the
technique tests/test_dedup_index.py uses). Prints one JSON line per
probe. Run manually; results are cited in ROUND7.md.
    python scripts/probe_scale_round7.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from library_data_warehouse_and_business_analytics_system_spark.functions import (  # noqa: E402
    text as TX,
)
from library_data_warehouse_and_business_analytics_system_spark.operators import (  # noqa: E402
    boilerplate, dedup_index,
)
from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E402
    get_spark,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import (  # noqa: E402
    load_table,
)

SF_DIR = "/root/testdata/sf0.1"


def replicate(df, id_col, n_copies, stride=10_000_000):
    out = df
    for i in range(1, n_copies):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * stride)))
    return out


def best_of(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def emit(probe, t1, tn, factor, labels=("x1", "xN")):
    print(json.dumps({"probe": probe, labels[0]: round(t1, 3),
                      labels[1]: round(tn, 3), "factor": factor,
                      "ratio": round(tn / t1, 2)}), flush=True)


def familiarity(docs):
    tok = docs.select("doc_id",
                      F.explode(TX.tokens(F.lower(F.col("text"))))
                      .alias("t"))
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    return (tok.join(counts, "t").groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 (F.sum("n") / F.count(F.lit(1))).alias("familiarity")))


def main() -> None:
    spark = get_spark("probe7")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").localCheckpoint()

    docs8 = replicate(docs, "doc_id", 8).localCheckpoint()
    docs64 = replicate(docs8, "doc_id", 8, stride=1_000_000_000) \
        .localCheckpoint()

    # 1) familiarity, shuffled vocabulary join
    t8 = best_of(lambda: familiarity(docs8)
                 .agg(F.sum("familiarity")).collect())
    t64 = best_of(lambda: familiarity(docs64)
                  .agg(F.sum("familiarity")).collect())
    emit("familiarity_shuffled_join_rows_8to64", t8, t64, 8,
         ("x8", "x64"))

    # 2) boilerplate, shuffled anti-join
    t8 = best_of(lambda: boilerplate.remove_boilerplate_lines(
        docs8, min_docs=3).agg(F.sum("n_kept")).collect())
    t64 = best_of(lambda: boilerplate.remove_boilerplate_lines(
        docs64, min_docs=3).agg(F.sum("n_kept")).collect())
    emit("boilerplate_shuffled_antijoin_rows_8to64", t8, t64, 8,
         ("x8", "x64"))

    # 3) probe after 30 daily appends, before vs after maintain_index
    is_new = TX.md5_bucket(F.col("doc_id"), 5, salt="batch:") == 4
    corpus, batch = docs.where(~is_new), docs.where(is_new)
    root = tempfile.mkdtemp(prefix="probe7_idx_")
    seed = corpus.limit(500).localCheckpoint()
    dedup_index.build_dedup_index(seed, root)
    rest = corpus.subtract(corpus.limit(500))
    day = TX.md5_bucket(F.col("doc_id"), 30, salt="m:")
    for i in range(30):
        dedup_index.append_to_index(rest.where(day == i), root,
                                    txn_id=f"day-{i}")
    t_frag = best_of(lambda: dedup_index.dedup_new_batch(
        spark, batch, root, threshold=0.5).collect())
    stats = dedup_index.maintain_index(spark, root,
                                       vacuum_retention_sec=0)
    t_compact = best_of(lambda: dedup_index.dedup_new_batch(
        spark, batch, root, threshold=0.5).collect())
    print(json.dumps({"probe": "dedup_probe_30appends_vs_maintained",
                      "fragmented_30dirs": round(t_frag, 3),
                      "compacted_1dir": round(t_compact, 3),
                      "ratio": round(t_compact / t_frag, 2),
                      "bands_before_files": stats["bands"]["before_files"],
                      "bands_target_files": stats["bands"]["target_files"]}),
          flush=True)

    # 4) partition-scoped merge: fixed delta, 8x table
    from library_data_warehouse_and_business_analytics_system_spark.sources.txlog import (  # noqa: E402,E501
        tx_merge_parts, tx_write_parts,
    )
    orders = (load_table(spark, SF_DIR, "orders")
              .select("o_orderkey", F.year("o_orderdate").alias("o_year"),
                      "o_custkey", F.col("o_totalprice").cast("double")
                      .alias("o_totalprice"))
              .localCheckpoint())
    # 8x = 8 disjoint key ranges in 8 disjoint year bands (more rows
    # AND more partitions, like eight more loaded years of history)
    copies = [orders.withColumn("o_orderkey",
                                F.col("o_orderkey") + F.lit(i * 10_000_000))
              .withColumn("o_year", F.col("o_year") + F.lit(10 * i))
              for i in range(8)]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    delta = (orders.filter(F.col("o_year") == 1995).limit(500)
             .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
             .localCheckpoint())

    def merge_time(df, tag):
        root = tempfile.mkdtemp(prefix=f"probe7_merge_{tag}_")
        t = f"{root}/orders"
        tx_write_parts(df, t, "o_year", mode="overwrite")
        t0 = time.perf_counter()
        tx_merge_parts(spark, t, delta, keys=["o_orderkey"],
                       part_col="o_year")
        return time.perf_counter() - t0

    t1 = merge_time(orders, "x1")
    t8 = merge_time(big.localCheckpoint(), "x8")
    emit("partition_scoped_merge_table_growth", t1, t8, 8)


if __name__ == "__main__":
    main()
