"""Scale-up probe for the round-6 operators: measure how wall time
grows when the data grows, on the operators whose 100 TB story is the
point — the incremental dedup probe (must be batch-bound, not
corpus-bound), boilerplate-line removal, temperature mixing, and the
matryoshka two-stage search (all should scale ~linearly in rows).

Replicates the sf0.1 documents/embeddings tables in memory with
disjoint ids (the same technique tests/test_dedup_index.py uses) so
no extra testdata is required. Prints one JSON line per probe:
{"probe": ..., "x1": sec, "xN": sec, "factor": N, "ratio": xN/x1}.

Run manually; results are cited in ROUND6.md.
    python scripts/probe_scale_round6.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from library_data_warehouse_and_business_analytics_system_spark.functions import (  # noqa: E402
    text as TX,
)
from library_data_warehouse_and_business_analytics_system_spark.operators import (  # noqa: E402
    boilerplate, dedup_index, mixture, similarity,
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


def emit(probe, t1, tn, factor):
    print(json.dumps({"probe": probe, "x1": round(t1, 3),
                      f"x{factor}": round(tn, 3), "factor": factor,
                      "ratio": round(tn / t1, 2)}), flush=True)


def main() -> None:
    import tempfile

    spark = get_spark("probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").localCheckpoint()
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint()

    # 1) incremental dedup probe: corpus 8x, batch fixed -> flat-ish
    is_new = TX.md5_bucket(F.col("doc_id"), 5, salt="batch:") == 4
    corpus, batch = docs.where(~is_new), docs.where(is_new)
    roots = {}
    for tag, c in (("x1", corpus), ("x8", replicate(corpus, "doc_id", 8))):
        roots[tag] = tempfile.mkdtemp(prefix=f"probe_idx_{tag}_")
        dedup_index.build_dedup_index(c.localCheckpoint(), roots[tag])
    t1 = best_of(lambda: dedup_index.dedup_new_batch(
        spark, batch, roots["x1"], threshold=0.5).collect())
    t8 = best_of(lambda: dedup_index.dedup_new_batch(
        spark, batch, roots["x8"], threshold=0.5).collect())
    emit("dedup_incremental_probe_corpus_growth", t1, t8, 8)

    # 2+3) boilerplate removal / temperature mixing: measured between
    # two NON-trivial sizes (8x -> 64x, i.e. 40k -> 320k docs) so the
    # ratio reflects the scaling regime, not the fixed job overhead
    # that dominates at 5k docs on 32 cores.
    docs8 = replicate(docs, "doc_id", 8).localCheckpoint()
    docs64 = replicate(docs8, "doc_id", 8, stride=1_000_000_000) \
        .localCheckpoint()
    t8 = best_of(lambda: boilerplate.remove_boilerplate_lines(
        docs8, min_docs=3).agg(F.sum("n_kept")).collect())
    t64 = best_of(lambda: boilerplate.remove_boilerplate_lines(
        docs64, min_docs=3).agg(F.sum("n_kept")).collect())
    emit("boilerplate_rows_growth_8to64", t8, t64, 8)

    t8 = best_of(lambda: mixture.temperature_mixture(
        docs8, 5000).agg(F.sum(F.col("kept").cast("int"))).collect())
    t64 = best_of(lambda: mixture.temperature_mixture(
        docs64, 5000).agg(F.sum(F.col("kept").cast("int"))).collect())
    emit("temperature_mixture_rows_growth_8to64", t8, t64, 8)

    # 4) matryoshka: corpus 8x, queries fixed -> ~linear in corpus
    #    (stage 1 scans it; stage 2 stays candidate-bounded)
    emb8 = replicate(emb, "vec_id", 8).localCheckpoint()
    queries = emb.filter(F.col("vec_id") < 8)
    t1 = best_of(lambda: similarity.matryoshka_topk(
        emb, queries, "embedding", "vec_id").count())
    t8 = best_of(lambda: similarity.matryoshka_topk(
        emb8, queries, "embedding", "vec_id").count())
    emit("matryoshka_corpus_growth", t1, t8, 8)


if __name__ == "__main__":
    main()
