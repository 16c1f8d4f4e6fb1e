"""Continuous CDC apply into a partitioned txlog table: the
streaming consumer of an I/U/D changelog feed (Debezium shape),
completing the CDC story — ``operators/cdc.py`` collapses a static
log, this module keeps a durable table in sync with a live one.

Per micro-batch of changelog rows, inside ``foreachBatch``:

1. collapse the batch to its NET effect per key
   (``apply_changelog``: latest seq wins, tombstone precedence);
2. merge partition-scoped through ``tx_merge_parts`` with a
   ``merge_fn`` that removes every batch-touched key from the
   current partitions and appends the batch's surviving versions —
   so an UPDATE replaces, a DELETE removes, an INSERT appends, and
   only the partitions named by the batch's rows are read or
   rewritten;
3. ``txn_id = batch_id`` makes a REDELIVERED micro-batch re-commit
   nothing — exactly-once table state from at-least-once delivery.

Semantics contract (pinned by tests/test_cdc_ingest.py): streaming a
changelog through N micro-batches in seq order produces the SAME
table as collapsing the whole log with ``apply_changelog`` in one
shot — including keys deleted in a later batch than their insert,
and keys re-inserted after a delete.

CDC source contract: every row (deletes included) carries the key's
CURRENT partition value — the same requirement Delta puts on a
partition-pruned MERGE source. A CDC feed that moves a row across
partitions must emit delete(old partition) + insert(new partition).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cdc import apply_changelog
from ..sources.txlog import tx_merge_parts


def apply_cdc_batch(batch: DataFrame, batch_id: int, table: str,
                    keys: Sequence[str], part_col: str,
                    seq_col: str = "seq", op_col: str = "op") -> None:
    """Apply one micro-batch of changelog rows to ``table``.
    Idempotent under redelivery of the same ``batch_id``."""
    spark = batch.sparkSession

    def fn(cur: DataFrame, src: DataFrame) -> DataFrame:
        # On a first merge into an empty table `cur` is
        # source.limit(0) and still carries op/seq — normalize.
        cur_rows = cur.drop(seq_col, op_col)
        survivors = apply_changelog(src, keys, seq_col, op_col)
        gone = src.select(*keys).distinct()
        return (cur_rows.join(gone, list(keys), "left_anti")
                .unionByName(survivors))

    # The RAW batch is the merge source (not its collapsed net
    # effect): a delete-only batch has an empty net, but its rows
    # still carry the partition values the merge must prune to and
    # rewrite; op/seq are stripped inside fn, so the table schema
    # stays clean.
    tx_merge_parts(spark, table, batch, keys=list(keys),
                   part_col=part_col, merge_fn=fn,
                   txn_id=f"cdc-{batch_id}")


def start_cdc_ingest(changelog_stream: DataFrame, table: str,
                     keys: Sequence[str], part_col: str,
                     checkpoint_dir: str, seq_col: str = "seq",
                     op_col: str = "op") -> "StreamingQuery":  # noqa: F821
    """Attach :func:`apply_cdc_batch` to a changelog stream."""
    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(batch_df, batch_id, table, keys, part_col,
                        seq_col, op_col)

    return (
        changelog_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
