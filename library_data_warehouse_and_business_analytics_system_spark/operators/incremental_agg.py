"""Incremental maintenance of SUM/COUNT aggregate tables from the
partitioned-table change feed — the downstream half of CDC: a
materialized daily-revenue (or any additive) rollup stays current by
applying only the CHANGED rows' contributions, instead of
recomputing over the whole fact after every merge.

Soundness: SUM and COUNT are abelian-group aggregates — an update
surfacing in ``tx_diff_parts`` as delete(old)+insert(new) contributes
``new - old`` exactly, deletes subtract, inserts add; groups whose
row count reaches zero are dropped. Hence::

    refresh(agg, feed(v0 → v1)) ≡ full recompute at v1

bit-exactly for integer/decimal sums and exactly-up-to-FP-reassociation
for doubles (the same caveat any partial aggregation has). AVG comes
out of (sum, count); MIN/MAX are NOT maintainable this way (deleting
the current extremum needs a rescan) and are deliberately excluded.

Scale shape: the feed is changed-partition-bounded (tx_diff_parts
reads only replaced partitions), the delta rollup is a two-phase hash
aggregate on the group key, and the aggregate table itself is
group-cardinality-sized — the full-outer refresh join moves aggregate
rows, never fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.txlog import (tx_diff_parts, tx_latest_id, tx_read,
                             tx_read_parts, tx_write)


def _rollup(rows: DataFrame, group_cols: list[str],
            sum_cols: list[str], signed: bool) -> DataFrame:
    sign = (F.when(F.col("op") == "insert", F.lit(1)).otherwise(F.lit(-1))
            if signed else F.lit(1))
    aggs = [F.sum(F.col(c) * sign).alias(f"sum_{c}") for c in sum_cols]
    aggs.append(F.sum(sign).cast("long").alias("n_rows"))
    return rows.groupBy(*group_cols).agg(*aggs)


def build_sum_aggregate(spark: SparkSession, fact_table: str,
                        agg_table: str, group_cols: list[str],
                        sum_cols: list[str]) -> int:
    """Full build of the aggregate table from the fact's current
    snapshot; returns the fact VERSION the aggregate now reflects —
    the caller persists it and hands it to the next ``refresh``."""
    version = tx_latest_id(fact_table)
    fact = tx_read_parts(spark, fact_table, as_of=version)
    agg = _rollup(fact, group_cols, sum_cols, signed=False)
    tx_write(agg, agg_table, mode="overwrite")
    return version


def refresh_sum_aggregate(spark: SparkSession, fact_table: str,
                          agg_table: str, group_cols: list[str],
                          sum_cols: list[str], since_version: int) -> int:
    """Apply the fact's change feed since ``since_version`` to the
    aggregate table (one atomic overwrite of the aggregate — it is
    group-sized, not fact-sized); returns the new reflected version."""
    version = tx_latest_id(fact_table)
    if version == since_version:
        return version
    feed = tx_diff_parts(spark, fact_table, since_version, version)
    delta = _rollup(feed, group_cols, sum_cols, signed=True).alias("d")
    cur = tx_read(spark, agg_table).alias("c")
    # USING-style join keeps one unambiguous column per group key,
    # coalesced across sides by Spark itself
    merged = cur.join(delta, group_cols, "full_outer")
    out_cols = list(group_cols)
    val_cols = []
    for c in sum_cols:
        val_cols.append(
            (F.coalesce(F.col(f"c.sum_{c}"), F.lit(0))
             + F.coalesce(F.col(f"d.sum_{c}"), F.lit(0)))
            .alias(f"sum_{c}"))
    val_cols.append(
        (F.coalesce(F.col("c.n_rows"), F.lit(0))
         + F.coalesce(F.col("d.n_rows"), F.lit(0)))
        .cast("long").alias("n_rows"))
    refreshed = (merged.select(*out_cols, *val_cols)
                 .filter(F.col("n_rows") > 0))
    tx_write(refreshed, agg_table, mode="overwrite")
    return version
