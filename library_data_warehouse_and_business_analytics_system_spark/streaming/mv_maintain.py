"""Streaming materialized-view maintenance: a fact stream merged
exactly-once into a partitioned txlog table, with SUM/COUNT and
MIN/MAX rollups caught up per micro-batch from the change feed —
never by rescanning the fact.

Per micro-batch, inside ``foreachBatch``:

1. MERGE the batch partition-scoped (``tx_merge_parts``,
   ``txn_id = batch_id`` — redelivery re-commits nothing);
2. refresh each registered aggregate with the *_mv protocol
   (operators/incremental_agg.py): the refresh reads its own
   reflected fact version from the aggregate's log and publishes
   under txn ``mv:<since>-><to>`` — so every crash window is closed:
   - crash after merge, before refresh → next batch's refresh span
     covers both deltas;
   - crash after refresh, before the stream checkpoint advances →
     the replayed batch's merge dedupes on its batch txn AND the
     refresh sees version == reflected and no-ops;
   - a replayed identical span dedupes inside tx_write itself.

The maintained aggregates therefore equal a full recompute after
every batch (pinned by tests/test_mv_maintain.py), at per-batch cost
proportional to the delta (SUM) plus extremum-affected groups
(MIN/MAX) — the streaming half of the incremental-aggregate story,
and the Spark-shaped replacement for the reference's trigger-
maintained summary tables (02_Trigger.sql's running counters).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..operators.incremental_agg import (
    refresh_minmax_aggregate_mv,
    refresh_sum_aggregate_mv,
)
from ..sources.txlog import tx_merge_parts


@dataclass
class MaterializedRollup:
    """One maintained aggregate: ``kind`` is 'sum' or 'minmax'."""
    agg_table: str
    group_cols: list[str]
    value_cols: list[str]
    kind: str = "sum"

    def refresh(self, spark, fact_table: str) -> None:
        if self.kind == "sum":
            refresh_sum_aggregate_mv(spark, fact_table, self.agg_table,
                                     self.group_cols, self.value_cols)
        elif self.kind == "minmax":
            refresh_minmax_aggregate_mv(spark, fact_table, self.agg_table,
                                        self.group_cols, self.value_cols)
        else:
            raise ValueError(f"unknown rollup kind {self.kind!r}")


@dataclass
class FactWithRollups:
    fact_table: str
    keys: list[str]
    part_col: str
    rollups: list[MaterializedRollup] = field(default_factory=list)


def ingest_mv_batch(batch: DataFrame, batch_id: int,
                    cfg: FactWithRollups, merge_fn=None) -> None:
    """Merge one micro-batch into the fact and catch every rollup up.
    Idempotent under redelivery of the same ``batch_id``."""
    spark = batch.sparkSession
    tx_merge_parts(spark, cfg.fact_table, batch, keys=cfg.keys,
                   part_col=cfg.part_col, merge_fn=merge_fn,
                   txn_id=f"mv-fact-{batch_id}")
    for r in cfg.rollups:
        r.refresh(spark, cfg.fact_table)


def start_mv_ingest(fact_stream: DataFrame, cfg: FactWithRollups,
                    checkpoint_dir: str,
                    merge_fn=None) -> "StreamingQuery":  # noqa: F821
    """Attach :func:`ingest_mv_batch` to a fact stream."""
    def process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_mv_batch(batch_df, batch_id, cfg, merge_fn)

    return (
        fact_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
