"""Cross-document sequence packing: give every document its exact
span [start_tok, end_tok) in a deterministic global token stream, so
shard writers can slice fixed-length training sequences (seq_len
boundaries) without any coordination beyond this frame.

The hard part at scale is the GLOBAL cumulative token offset — a
naive ``Window.orderBy(...)`` is a single-partition sort of the whole
corpus. This uses the two-phase shape (``operators/surrogate.py``):

1. ``repartitionByRange`` on the deterministic order key — a real
   range shuffle, parallel, and partition i holds strictly smaller
   keys than partition i+1;
2. per-partition token totals (one tiny collect: #partitions rows),
   cumulated driver-side into per-partition offsets;
3. a PER-PARTITION window adds the local running sum to the
   partition's offset — no global window anywhere.

Order is content-deterministic (md5 over salted text, doc id
tie-break), so the pack layout is reproducible across runs and
engines — the same property the hash split and stratified sample
guarantee, extended to sequence order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def pack_sequences(docs: DataFrame, seq_len: int = 256,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_partitions: int | None = None,
                   salt: str = "pack:") -> DataFrame:
    """Returns ``(id_col, n_tokens, start_tok, end_tok, first_seq,
    last_seq)`` — spans are gapless and non-overlapping over the
    corpus; ``first_seq``/``last_seq`` are the fixed-length sequence
    ids the document's tokens land in (inclusive)."""
    base = docs.select(
        F.col(id_col),
        F.md5(F.concat(F.lit(salt), F.col(text_col))).alias("_ok"),
        TX.token_count(F.col(text_col)).cast("long").alias("n_tokens"))
    parts = n_partitions or base.sparkSession.sparkContext.defaultParallelism
    # freeze the layout: the totals pass and the window pass must see
    # the identical range partitioning (same contract as
    # with_fact_surrogate_key)
    ranged = (base.repartitionByRange(parts, "_ok", id_col)
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint())
    totals = {r["_pid"]: r["s"] for r in
              ranged.groupBy("_pid")
              .agg(F.sum("n_tokens").alias("s")).collect()}
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((int(pid), acc))
        acc += totals[pid]
    # Per-partition offsets enter as a broadcast-joined tiny DataFrame
    # keyed on _pid — a bounded O(#partitions) hash probe per row. (A
    # baked-in coalesce(when...) chain would be a 10k-branch
    # expression per row at 10k+ cluster partitions — VERDICT r5.)
    off_df = ranged.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off long")
    joined = ranged.join(F.broadcast(off_df), "_pid", "left") \
        .withColumn("_off", F.coalesce("_off", F.lit(0)))
    w = Window.partitionBy("_pid").orderBy("_ok", id_col)
    cum_incl = F.sum("n_tokens").over(w)
    start = (F.col("_off") + cum_incl - F.col("n_tokens")).cast("long")
    end = (F.col("_off") + cum_incl).cast("long")
    return (
        joined.select(
            id_col, "n_tokens",
            start.alias("start_tok"), end.alias("end_tok"),
            F.floor(start / seq_len).cast("long").alias("first_seq"),
            # last token index is end-1; empty docs stay in first_seq
            F.greatest(F.floor((end - 1) / seq_len),
                       F.floor(start / seq_len))
            .cast("long").alias("last_seq"))
    )
