"""Continuous fact ingest into the durable warehouse: the streaming
twin of the daily EP3 borrowing load (plans/library/durable.py),
mirroring streaming/dedup_ingest.py's exactly-once shape.

Per micro-batch of raw ``borrowed_books`` rows, inside
``foreachBatch``:

1. SCREEN the delta against the CHECK rules (same rejection semantics
   as the batch loads);
2. LOAD it into fact shape (``load_fact_borrowing`` against the
   warehouse's dimensions — read once at stream start; dimension
   changes ride the daily batch load, not the stream);
3. MERGE partition-scoped through ``tx_merge_parts`` with the
   NOT-EXISTS append + overdue-cap ``merge_fn`` and
   ``txn_id = batch_id``, so a REDELIVERED micro-batch (crash between
   commit and checkpoint advance) re-commits nothing — exactly-once
   fact rows from at-least-once delivery, and only the year
   partitions the micro-batch touches are ever read or rewritten.

Semantics contract (pinned by tests/test_durable_warehouse.py):
streaming the borrowing feed through N micro-batches produces the
SAME fact table as running the partition-scoped batch merge over the
same N chunks in order, and the same table N sequential in-memory
``subsequent_load`` calls build. Batch BOUNDARIES are part of the
semantics — ``returnRate`` is a batch-relative measure (per-book
totals over the arriving delta, 07_SubsequentLoading.sql's
delta-scoped metrics), so a union-load over regrouped chunks
legitimately differs; what the stream guarantees is exact agreement
with the equivalent sequence of batch loads.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame

from ..operators.merge import insert_not_exists
from ..plans.library import incremental as INC
from ..plans.library.durable import FACT_KEYS, YEAR_KEY, _with_year
from ..plans.library.etl import load_fact_borrowing, screen_oltp
from ..sources.txlog import tx_merge_parts, tx_read


def ingest_borrowing_batch(batch: DataFrame, batch_id: int, root: str,
                           oltp: dict[str, DataFrame],
                           as_of: dt.date) -> None:
    """Process one micro-batch of borrowed_books rows. Idempotent
    under redelivery of the same ``batch_id``."""
    spark = batch.sparkSession
    screened = screen_oltp({"borrowed_books": batch}, "quarantine", None)
    delta_raw = screened.get("borrowed_books")
    if delta_raw is None:
        return
    dim_date = tx_read(spark, f"{root}/dim_date")
    dim_members = tx_read(spark, f"{root}/dim_members")
    dim_book = tx_read(spark, f"{root}/dim_book")
    delta = _with_year(
        load_fact_borrowing(delta_raw, oltp["book_copies"], dim_date,
                            dim_members, dim_book, as_of), dim_date)
    keys = FACT_KEYS["fact_borrowing"]
    tx_merge_parts(
        spark, f"{root}/fact_borrowing", delta, keys=keys,
        part_col=YEAR_KEY,
        merge_fn=lambda cur, src: INC.cap_overdue_days(
            insert_not_exists(cur, src, keys)),
        txn_id=f"wh-borrow-{batch_id}")
    # advance the consistent-reader snapshot to include this batch
    # (one tiny JSON per micro-batch; a redelivered batch re-commits
    # nothing above, and the re-pinned ids are then identical)
    from ..plans.library.durable import DIMS
    from ..sources.txmulti import publish_manifest, snapshot_current
    publish_manifest(root, snapshot_current(root, [*DIMS, *FACT_KEYS]))


def start_borrowing_ingest(borrow_stream: DataFrame, root: str,
                           oltp: dict[str, DataFrame],
                           checkpoint_dir: str, as_of: dt.date
                           ) -> "StreamingQuery":  # noqa: F821
    """Attach :func:`ingest_borrowing_batch` to a raw borrowed_books
    stream. The durable warehouse must exist (``publish_warehouse``)."""
    def process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_borrowing_batch(batch_df, batch_id, root, oltp, as_of)

    return (
        borrow_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
