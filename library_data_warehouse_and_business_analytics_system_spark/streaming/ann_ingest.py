"""Continuous embedding ingest into the persisted ANN index: the
streaming twin of ``operators/ann_index.ann_index_upsert``, mirroring
``streaming/dedup_ingest.py``'s exactly-once shape.

Per micro-batch, inside ``foreachBatch``: assign the batch's vectors
to the EXISTING coarse quantizer and partition-scoped-merge them into
only their touched cells, with ``txn_id = batch_id`` — a REDELIVERED
micro-batch (crash between the index commit and the stream's
checkpoint advance) re-commits nothing, Delta's txnAppId pattern on
our commit log. The quantizer is never retrained on the hot path;
``ann_index_cell_stats`` drift is the operator's retrain signal.

Semantics contract (pinned by tests/test_ann_index.py): streaming the
delta through N micro-batches leaves the SAME index as upserting the
same N batches sequentially — and, probed fully, the same exact
top-k as a brute-force scan of build ∪ delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.ann_index import ann_index_upsert


def ingest_batch(batch: DataFrame, batch_id: int, index_root: str, *,
                 id_col: str, vec_col: str) -> None:
    """Upsert one micro-batch into the index. Idempotent under
    redelivery of the same ``batch_id``."""
    ann_index_upsert(batch.sparkSession, index_root, batch,
                     id_col, vec_col, txn_id=f"ann-ingest-{batch_id}")


def start_ann_ingest(vec_stream: DataFrame, index_root: str,
                     checkpoint_dir: str, *, id_col: str,
                     vec_col: str) -> "StreamingQuery":  # noqa: F821
    """Attach :func:`ingest_batch` to an embedding stream. The index
    must exist (``ann_index_build`` — over the existing corpus, or a
    seed sample large enough to train the quantizer)."""
    def process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df, batch_id, index_root,
                     id_col=id_col, vec_col=vec_col)

    return (
        vec_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
