"""Continuous corpus ingest with near-dup suppression: the streaming
twin of the daily batch cycle over the persisted band index
(operators/dedup_index.py).

Per micro-batch, inside ``foreachBatch``:

1. PROBE the index for near-dup pairs touching the batch
   (``dedup_new_batch`` — broadcast batch probe, candidate-bounded
   verify, cost scales with the batch);
2. DROP batch docs that duplicate an already-indexed doc (either pair
   orientation), and for batch-internal duplicate pairs keep the
   lower id — the same canonical-min policy the batch pipeline uses;
3. APPEND the survivors' bands + shingles to the index and the
   surviving documents to the kept-corpus table, all through the
   txlog with ``txn_id = batch_id`` so a REDELIVERED micro-batch
   (crash between commit and checkpoint advance) re-commits only what
   didn't land — exactly-once output from at-least-once delivery,
   Delta's txnAppId pattern on our commit log.

Semantics contract (pinned by tests/test_dedup_index.py): streaming
the corpus through N micro-batches produces the SAME kept corpus and
the SAME index as running the sequential batch probe→drop→append loop
over the same N batches in the same order. (Like any incremental
dedup, the result depends on arrival order — earlier docs win — which
is exactly the semantics a continuously-ingesting corpus wants.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup_index import (_meta, append_to_index,
                                     dedup_new_batch)
from ..sources.txlog import tx_write


def ingest_batch(batch: DataFrame, batch_id: int, index_root: str,
                 kept_table: str, *, text_col: str = "text",
                 threshold: float = 0.8) -> None:
    """Process one micro-batch: probe → drop dups → append survivors.
    Idempotent under redelivery of the same ``batch_id``."""
    spark = batch.sparkSession
    id_col = _meta(index_root)["id_col"]
    pairs = dedup_new_batch(spark, batch, index_root,
                            text_col=text_col, threshold=threshold)

    # classify each pair side: in this batch or already indexed
    ids = batch.select(F.col(id_col).alias("_x"),
                       F.lit(True).alias("_in"))
    p = (pairs
         .join(F.broadcast(ids).withColumnRenamed("_x", "a")
               .withColumnRenamed("_in", "a_in"), "a", "left")
         .join(F.broadcast(ids).withColumnRenamed("_x", "b")
               .withColumnRenamed("_in", "b_in"), "b", "left"))
    # batch-batch pair → drop b (a < b, keep canonical min);
    # batch-vs-indexed → drop the batch-side member whichever side it is
    drop = (p.select(F.when(F.col("a_in").isNotNull()
                            & F.col("b_in").isNull(), F.col("a"))
                     .otherwise(F.col("b")).alias(id_col))
            .distinct())
    kept = batch.join(drop, id_col, "left_anti")

    txn = f"dedup-ingest-{batch_id}"
    append_to_index(kept, index_root, text_col=text_col, txn_id=txn)
    tx_write(kept, kept_table, mode="append", txn_id=txn)


def start_dedup_ingest(doc_stream: DataFrame, index_root: str,
                       kept_table: str, checkpoint_dir: str, *,
                       text_col: str = "text",
                       threshold: float = 0.8
                       ) -> "StreamingQuery":  # noqa: F821
    """Attach :func:`ingest_batch` to a document stream. The index
    must exist (``build_dedup_index`` — over the existing corpus, or
    over ``docs.limit(0)`` to bootstrap an empty one)."""
    def process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df, batch_id, index_root, kept_table,
                     text_col=text_col, threshold=threshold)

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
