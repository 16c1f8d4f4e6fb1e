"""CDC changelog application: collapse an (insert/update/delete)
event stream into the latest snapshot.

The reference loads deltas with key-scoped MERGE
(``07_SubsequentLoading.sql`` — one statement per operation kind);
a changelog feed generalizes that: one ordered stream of I/U/D rows
per key, applied by "latest wins". This is the Debezium/Delta CDF
shape, and the batch half of what ``streaming/warehouse_ingest.py``
does per micro-batch.

Scale: one shuffle keyed on the primary key; the per-key window
partitions on the key (cardinality = key space, per-partition size
= versions per key, typically small), so no reducer serializes.
Deletes drop AFTER the latest-version pick so a delete followed by
nothing stays deleted and a re-insert after a delete survives.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changelog(log: DataFrame, keys: Sequence[str],
                    seq_col: str = "seq", op_col: str = "op",
                    ) -> DataFrame:
    """Latest-wins apply of an I/U/D changelog.

    ``seq_col`` is the total order within a key (commit LSN,
    Kafka offset, batch id). Rows with the highest seq win; if the
    winner is a delete the key vanishes. The op/seq columns are
    dropped from the snapshot.

    Ties on seq (e.g. an update and a delete carrying the same
    batch id) resolve deterministically by tombstone precedence —
    the delete wins — with a final lexicographic op tie-break so no
    ordering is ever left to partition/arrival order.
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        (F.col(op_col) == "D").cast("int").desc(),
        F.col(op_col))
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != F.lit("D")))
        .drop("_rn", seq_col, op_col)
    )
