"""Distribution-rank surface — NTILE / PERCENT_RANK / CUME_DIST —
computed WITHOUT a global single-partition window.

The naive ``F.ntile(10).over(Window.orderBy(...))`` funnels the whole
table through ONE reducer (Spark plans an Exchange SinglePartition) —
the same scale-killer the packing/surrogate operators already solve
with the two-phase range shape. This module reuses that shape for
ranking:

1. ``repartitionByRange`` on the order key (parallel range shuffle;
   partition i holds strictly smaller keys than partition i+1);
2. per-partition row counts → driver-side prefix offsets (one tiny
   collect of #partitions rows);
3. a PER-PARTITION ``row_number`` plus the partition's offset = the
   exact global rank; NTILE / PERCENT_RANK / CUME_DIST are then
   CLOSED-FORM arithmetic over (rank, N) — bit-identical to the SQL
   window definitions when the order is strict.

STRICT total order is required (pass a unique tie-break key): with no
ties, RANK == ROW_NUMBER, PERCENT_RANK == (rank-1)/(N-1) and
CUME_DIST == rank/N exactly as the standard defines them, and NTILE's
first-(N mod n)-buckets-get-one-extra split has the closed form below
— so the result is bit-exact vs any windowed engine, at shuffle cost
instead of single-reducer cost.

Reference parity: NTILE / PERCENT_RANK / CUME_DIST / RATIO_TO_REPORT
are the Oracle analytic-function family the reference's report
queries draw from (SURVEY.md §2 W-family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(df: DataFrame, order_by: list[Column],
                     rank_col: str = "global_rank",
                     n_partitions: int | None = None) -> tuple[DataFrame, int]:
    """Adds a 1-based dense global rank under ``order_by`` (which must
    be a STRICT total order — include a unique tie-break column).
    Returns ``(frame, n_rows)``; the count is a free by-product of the
    offsets pass. No global window: two-phase range shape."""
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    # freeze the layout: the counts pass and the rank pass must see
    # the identical range partitioning (same localCheckpoint contract
    # as pack_sequences / with_fact_surrogate_key)
    ranged = (df.repartitionByRange(parts, *order_by)
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint())
    counts = {r["_pid"]: r["c"] for r in
              ranged.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((int(pid), acc))
        acc += counts[pid]
    off_df = ranged.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order_by)
    out = (ranged.join(F.broadcast(off_df), "_pid", "left")
           .withColumn(rank_col,
                       (F.coalesce("_off", F.lit(0))
                        + F.row_number().over(w)).cast("long"))
           .drop("_pid", "_off"))
    return out, acc


def _ntile_expr(rank: Column, n_rows: int, n_tiles: int) -> Column:
    """Closed-form NTILE over a strict rank: with N = q*n + r, the
    first r buckets hold q+1 rows, the rest q — the SQL-standard
    split, as arithmetic instead of a window."""
    q, r = divmod(n_rows, n_tiles)
    if q == 0:            # fewer rows than tiles: bucket i = row i
        return rank.cast("int")
    if r == 0:
        return (F.floor((rank - 1) / q) + 1).cast("int")
    boundary = r * (q + 1)
    big = F.floor((rank - 1) / (q + 1)) + 1
    small = r + F.floor((rank - 1 - boundary) / q) + 1
    return F.when(rank <= boundary, big).otherwise(small).cast("int")


def with_rank_stats(df: DataFrame, order_by: list[Column],
                    n_tiles: int = 10,
                    n_partitions: int | None = None) -> DataFrame:
    """Adds ``global_rank``, ``ntile``, ``percent_rank`` and
    ``cume_dist`` under a strict ``order_by`` — the full SQL
    distribution-rank family, two-phase (no single-reducer window).
    Doubles are the standard formulas over exact integers < 2^53, so
    they are bit-identical to any conforming engine's."""
    ranked, n = with_global_rank(df, order_by, n_partitions=n_partitions)
    rank = F.col("global_rank")
    pr = (F.lit(0.0) if n <= 1 else
          (rank - 1).cast("double") / F.lit(float(n - 1)))
    return (ranked
            .withColumn("ntile", _ntile_expr(rank, n, n_tiles))
            .withColumn("percent_rank", pr)
            .withColumn("cume_dist", rank.cast("double") / F.lit(float(n))))
