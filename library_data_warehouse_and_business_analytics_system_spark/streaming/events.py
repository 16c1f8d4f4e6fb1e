"""Structured Streaming surface over the ``events`` stream.

The reference is batch-only (SURVEY.md §2.9): its "incremental" path is
bind-variable MERGE / NOT-EXISTS re-runs (07_SubsequentLoading.sql:324-435).
The idiomatic Spark replacement is Structured Streaming:

- a file/Kafka source feeding watermarked windowed aggregations
  (tumbling / sliding / session windows);
- ``foreachBatch`` + MERGE for exactly the incremental-upsert semantics
  of ``07_SubsequentLoading.sql:331-355`` — each micro-batch plays the
  role of one "new OLTP rows arrived" batch;
- ``applyInPandasWithState`` for custom stateful logic the built-in
  windows can't express (running per-key totals with timeouts).

Every aggregation here has a batch twin in ``plans/streaming_ops.py``
(same ``F.window`` / ``F.session_window`` expressions run in batch mode)
which is differential-tested against a DuckDB oracle; the streaming
tests then assert stream == batch on the same input. At scale, the file
source below swaps for Kafka and the parquet sink for Delta — the plan
shapes (partial aggregation per micro-batch, state store keyed by
window+group) are unchanged.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)

#: Schema of the events stream (TESTDATA.md), post timestamp-normalization.
EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def events_file_stream(spark: SparkSession, source_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """Parquet-directory file source for the events schema.

    ``maxFilesPerTrigger=1`` makes each file one micro-batch, which is
    how the tests replay "days arriving in order". In production the
    same pipeline reads Kafka; only this constructor changes.
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


# ---------------------------------------------------------------------------
# Windowed aggregations (shared by batch twins in plans/streaming_ops.py).


def tumbling_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts+sums per event_type with late-data bound.

    Works on a streaming *or* batch DataFrame (``F.window`` is the same
    expression in both); the watermark is applied only when streaming.
    Output keys window start as epoch seconds so the DuckDB oracle can
    reproduce it with integer bucket math (tz-independent).
    """
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    # Sum through DECIMAL: exact + order-independent, so the streaming
    # partial-agg merge order and the oracle's scan order can't skew
    # low-order double bits.
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(20,6)"))
             .cast("double").alias("sum_value"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start"),
                "event_type", "n_events", "sum_value")
    )


def sliding_event_counts(events: DataFrame, window: str = "1 hour",
                         slide: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide
    overlapping windows — Spark expands this natively; the oracle
    reproduces it with a generated bucket-offset cross join)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start"),
                "event_type", "n_events")
    )


def ohlc_bars(events: DataFrame, window: str = "15 minutes",
              watermark: str = "2 hours") -> DataFrame:
    """OHLC bars per (event_type, window): open/close via min_by/
    max_by on a composite (ts, event_id) ordering key — deterministic
    under ties — high/low as plain MIN/MAX. One stateful hash
    aggregate; works on a streaming or batch DataFrame (the batch
    twin is the `events_ohlc_15m` gate's aggregate, so stream ≡ batch
    is pytest-pinned)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    ordk = (F.unix_timestamp("ts") * F.lit(1000000)
            + F.col("event_id")).cast("bigint")
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.min_by("value", ordk).cast("double").alias("open"),
             F.max("value").cast("double").alias("high"),
             F.min("value").cast("double").alias("low"),
             F.max_by("value", ordk).cast("double").alias("close"),
             F.count(F.lit(1)).alias("n_events"))
        .select(F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
                "event_type", "open", "high", "low", "close", "n_events")
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows per user (F.session_window): the
    streaming-native form of the batch LAG+running-SUM sessionizer
    (plans/core_sql2.events_sessionize). A session's bounds are
    [first_ts, last_ts] over events closer than ``gap`` apart."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .select("user_id",
                F.unix_timestamp("first_ts").alias("session_start"),
                F.unix_timestamp("last_ts").alias("session_end"),
                "n_events")
    )


def dedup_events_within_watermark(events: DataFrame,
                                  watermark: str = "2 hours") -> DataFrame:
    """Exactly-once ingest dedup on event_id.

    Streaming: ``dropDuplicatesWithinWatermark`` — dedup state is
    keyed by event_id and EVICTED once the watermark passes, so state
    is bounded by the duplicate-arrival window instead of growing with
    the stream (plain ``dropDuplicates`` on a stream never evicts).
    The at-least-once source + this operator = exactly-once rows, the
    standard Kafka-ingest shape. Batch twin: plain dropDuplicates."""
    if events.isStreaming:
        return (events.withWatermark("ts", watermark)
                .dropDuplicatesWithinWatermark(["event_id"]))
    return events.dropDuplicates(["event_id"])


# ---------------------------------------------------------------------------
# foreachBatch incremental upsert — the Structured Streaming analogue of
# the reference's MERGE-based subsequent loading.


def start_foreach_batch_upsert(stream: DataFrame, target_path: str,
                               checkpoint_dir: str, keys: list[str],
                               aggregate, n_buckets: int = 32,
                               ) -> "StreamingQuery":  # noqa: F821
    """Continuously MERGE micro-batches into a parquet target.

    Each micro-batch is aggregated by ``aggregate(batch_df)`` and
    merged into ``target_path`` on ``keys`` with additive update
    semantics delegated to the caller's aggregate. Mirrors
    07_SubsequentLoading.sql:331-355 where each run folds just the new
    rows into the facts.

    Scale shape: the target is hash-partitioned on the merge key into
    ``n_buckets`` directories (``part=N``), and a micro-batch rewrites
    ONLY the partitions its delta touches — the read side prunes to
    affected partitions and the write uses dynamic partition overwrite.
    Work per batch is O(touched partitions), parallel across them,
    never a single-task whole-target rewrite. On Delta/Iceberg the
    read-merge-write collapses into a transactional keyed MERGE.
    """
    part = F.pmod(F.xxhash64(*[F.col(k) for k in keys]),
                  F.lit(n_buckets)).cast("int")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = aggregate(batch_df).withColumn("part", part)
        have_target = os.path.isdir(target_path) and any(
            f.startswith("part=") or f.endswith(".parquet")
            for f in os.listdir(target_path)
        )
        if have_target:
            touched = [r["part"] for r in
                       delta.select("part").distinct().collect()]
            current = (spark.read.parquet(target_path)
                       .filter(F.col("part").isin(touched))
                       .select(delta.columns))
            merged = (
                current.unionByName(delta)
                .groupBy(*keys, "part")
                .agg(*[F.sum(c).alias(c) for c in delta.columns
                       if c not in keys and c != "part"])
            )
        else:
            merged = delta
        conf = spark.conf
        prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (merged.write.mode("overwrite").partitionBy("part")
             .parquet(target_path))
        finally:
            conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: running per-user totals via
# applyInPandasWithState (state the built-in windows can't express).

RUNNING_STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

RUNNING_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def _running_totals(key, pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "sum_value": [round(s, 6)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user event count/value-sum, emitted every
    micro-batch (output mode ``update``). State lives in the state
    store keyed by user_id — at 100 TB this scales with distinct users,
    not events, and RocksDB state backend handles the key volume."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(stream_df: DataFrame, table_name: str,
                         checkpoint_dir: str,
                         output_mode: str = "complete") -> None:
    """Drain a streaming aggregation into an in-memory sink with
    availableNow (process-everything-then-stop) — the test harness's
    way of getting a deterministic final answer from a stream."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# Stream-stream interval join: purchases ⋈ same-user views within the
# preceding 30 minutes. Watermarks on both sides + the event-time bound
# let Spark expire join state (a view can only match purchases up to
# 30 min later, so state retention is watermark + 30 min per side).
# Batch twin with the DuckDB oracle: plans/streaming_ops.events_interval_join.


def purchase_view_interval_join(events: DataFrame,
                                watermark: str = "2 hours") -> DataFrame:
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts"))
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"), F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"), F.col("value").alias("v_value"))
    if events.isStreaming:
        purchases = purchases.withWatermark("p_ts", watermark)
        views = views.withWatermark("v_ts", watermark)
    return purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTE"))
        & (F.col("v_ts") < F.col("p_ts")),
        "inner",
    ).select("p_id", "user_id", "p_ts", "v_id", "v_ts", "v_value")


def event_rate_anomalies(events: DataFrame, window: str = "1 hour",
                         trailing: int = 24,
                         z_threshold: float = 3.0) -> DataFrame:
    """Rate-anomaly detection per event type: tumbling-window counts
    scored against the mean/stddev of the ``trailing`` PRECEDING
    windows (the current window never sees itself — no self-masking).

    Batch shape: one two-phase count aggregate (shuffle carries one
    row per (type, window)), then a window function over the already
    reduced frame — per-type state is ``trailing`` rows regardless of
    event volume, the same state bound the streaming twin would keep.
    Windows with fewer than 2 trailing samples or zero variance get
    NULL z (undefined, not 'anomalous'): flagged = |z| >= threshold.

    Returns (event_type, window_start, n_events, baseline_mean,
    baseline_std, z, is_anomaly) ordered by (event_type, window_start).
    """
    from pyspark.sql import Window as W

    counts = (
        events.groupBy("event_type",
                       F.window("ts", window).start.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    trail = (W.partitionBy("event_type").orderBy("window_start")
             .rowsBetween(-trailing, -1))
    scored = counts.select(
        "event_type", "window_start", "n_events",
        F.avg("n_events").over(trail).alias("baseline_mean"),
        F.stddev_samp("n_events").over(trail).alias("baseline_std"),
    )
    z = ((F.col("n_events") - F.col("baseline_mean"))
         / F.when(F.col("baseline_std") > 0, F.col("baseline_std")))
    return (
        scored.select(
            "*", z.alias("z"),
            F.when(F.abs(z) >= z_threshold, True).otherwise(False)
            .alias("is_anomaly"))
        .orderBy("event_type", "window_start")
    )


def start_anomaly_stream(stream: DataFrame, results_path: str,
                         checkpoint_dir: str, window: str = "1 hour",
                         trailing: int = 24, z_threshold: float = 3.0,
                         watermark: str = "2 hours",
                         ) -> "StreamingQuery":  # noqa: F821
    """Streaming twin of :func:`event_rate_anomalies`.

    Stage 1 is the built-in watermarked tumbling count in APPEND mode,
    so a (type, window) row reaches foreachBatch exactly once, when
    the watermark finalizes it. Stage 2 re-scores the WHOLE window
    spine (history ∪ new finalized windows) with the identical
    trailing-window logic and atomically overwrites ``results_path``
    — recompute-and-overwrite is idempotent under batch replay, and
    the spine is window-grain (types × windows/year), so "recompute
    everything" is a few thousand rows per type-year no matter how
    many raw events the stream carries. Dedup on the keys guards
    against replayed batches.

    Equivalence contract (pytest): the results equal the batch twin
    restricted to finalized windows — windows newer than
    max(event_ts) − watermark are still open in the state store and
    intentionally absent.
    """
    from pyspark.sql import Window as W

    counts = (
        stream.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("event_type", F.col("window.start").alias("window_start"),
                "n_events")
    )

    def score(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spine = batch_df
        if os.path.isdir(results_path) and os.listdir(results_path):
            hist = (spark.read.parquet(results_path)
                    .select("event_type", "window_start", "n_events"))
            # eager localCheckpoint cuts the lineage off the target
            # files BEFORE the overwrite deletes them (a lazy plan
            # would re-read the path mid-write and fail)
            spine = (hist.unionByName(spine)
                     .dropDuplicates(["event_type", "window_start"])
                     .localCheckpoint())
        trail = (W.partitionBy("event_type").orderBy("window_start")
                 .rowsBetween(-trailing, -1))
        scored = spine.select(
            "event_type", "window_start", "n_events",
            F.avg("n_events").over(trail).alias("baseline_mean"),
            F.stddev_samp("n_events").over(trail).alias("baseline_std"),
        )
        z = ((F.col("n_events") - F.col("baseline_mean"))
             / F.when(F.col("baseline_std") > 0, F.col("baseline_std")))
        out = scored.select(
            "*", z.alias("z"),
            F.when(F.abs(z) >= z_threshold, True).otherwise(False)
            .alias("is_anomaly"))
        out.write.mode("overwrite").parquet(results_path)

    return (
        counts.writeStream.outputMode("append")
        .foreachBatch(score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming EWMA: the stateful twin of operators/timeseries.ewma_scan.
# Per key the state is ONE (pending_day, pending_sum, s, started)
# tuple; a day is FINALIZED (folded into the recurrence and emitted,
# append mode) when the first event of a LATER day arrives — the same
# can't-know-it's-complete-until-you-see-the-next contract a
# watermarked daily window would give, expressed as scan state because
# the EWMA recurrence itself is not a windowed aggregate. Requires the
# in-order feed the other stateful operators assume (the Kafka-like
# chronological replay in the tests); an out-of-order day RAISES
# rather than silently folding history in the wrong order.

EWMA_STATE_SCHEMA = StructType([
    StructField("pending_day", LongType()),   # epoch days
    StructField("pending_sum", DoubleType()),
    StructField("s", DoubleType()),
    StructField("started", LongType()),       # 0/1 (no BooleanType in state)
])
EWMA_OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("day", LongType()),           # epoch days
    StructField("daily_value", DoubleType()),
    StructField("ewma", DoubleType()),
])


def _ewma_state_fn(alpha: float):
    one_minus = 1.0 - alpha

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        pend_day, pend_sum, s, started = (
            state.get if state.exists else (None, 0.0, 0.0, 0))
        out: list[tuple] = []
        for pdf in pdfs:
            days = (pdf["ts"].dt.normalize().astype("int64")
                    // 86_400_000_000_000)
            sums = pdf["value"].astype("float64").groupby(days).sum()
            for d, v in sums.sort_index().items():
                d = int(d)
                if pend_day is None:
                    pend_day, pend_sum = d, float(v)
                elif d == pend_day:
                    pend_sum += float(v)
                elif d > pend_day:
                    s = (one_minus * s + alpha * pend_sum) if started \
                        else pend_sum
                    started = 1
                    out.append((key[0], pend_day, pend_sum, s))
                    pend_day, pend_sum = d, float(v)
                else:
                    raise ValueError(
                        f"out-of-order day {d} after {pend_day} for key "
                        f"{key[0]}: the EWMA scan state requires an "
                        f"in-order feed")
        state.update((pend_day, pend_sum, s, started))
        if out:
            yield pd.DataFrame(
                out, columns=["event_type", "day", "daily_value", "ewma"])

    return fn


def streaming_daily_ewma(events: DataFrame,
                         alpha: float = 0.5) -> DataFrame:
    """Per-event-type daily-value EWMA over a stream, append mode:
    one row per (type, day) the moment the day is known complete.
    State per key is O(1) — at 100 TB/day this scales with the number
    of series keys, not events. The batch twin is the
    `events_daily_ewma` gate; `tests/test_streaming.py` pins
    stream ≡ batch on the finalized prefix (every day except each
    key's last, which no future event has closed yet)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _ewma_state_fn(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
