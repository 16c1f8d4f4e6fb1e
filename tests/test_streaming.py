"""Structured Streaming tests: stream == batch on the same input.

Each windowed aggregation's batch twin is oracle-checked against DuckDB
in test_correctness.py; here we replay the events table through a file
source (one parquet file per micro-batch) and assert the streaming
result equals the batch result — closing the loop stream == batch ==
oracle. Plus: foreachBatch incremental upsert (the Spark-native form of
07_SubsequentLoading.sql's MERGE loads) and an applyInPandasWithState
custom stateful operator.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import load_table
from library_data_warehouse_and_business_analytics_system_spark.streaming import events as SE


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as 4 time-ordered parquet files: file k holds
    the k-th ts-quartile and gets an increasing mtime, so the file
    source replays history chronologically (a Kafka-like in-order feed;
    session-window state filters events behind the watermark, so a
    shuffled replay would legitimately drop them as late)."""
    import os
    import time

    d = tmp_path_factory.mktemp("events_stream")
    src = str(d / "src")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props")
    chunked = events.withColumn(
        "_chunk", F.ntile(4).over(Window.orderBy("ts", "event_id")))
    base = time.time()
    seen: set[str] = set()
    for k in range(1, 5):
        chunked.filter(F.col("_chunk") == k).drop("_chunk") \
            .coalesce(1).write.mode("append").parquet(src)
        fresh = {f for f in os.listdir(src) if f.endswith(".parquet")} - seen
        seen |= fresh
        for f in fresh:
            os.utime(os.path.join(src, f), (base + k * 10, base + k * 10))
    return src


def _drain(spark, stream_df, name, tmp_path, mode="complete"):
    SE.run_stream_to_memory(stream_df, name, str(tmp_path / f"ck_{name}"),
                            output_mode=mode)
    return spark.table(name)


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("agg_fn", [
    SE.tumbling_event_counts,
    SE.sliding_event_counts,
    SE.session_window_stats,
    SE.ohlc_bars,
], ids=["tumbling", "sliding", "session", "ohlc"])
def test_stream_equals_batch(spark, sf_dir, stream_dir, tmp_path, agg_fn):
    stream = SE.events_file_stream(spark, stream_dir)
    name = f"mem_{agg_fn.__name__}"
    got = _drain(spark, agg_fn(stream), name, tmp_path)
    expected = agg_fn(load_table(spark, sf_dir, "events"))
    pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(expected),
                                  check_dtype=False)


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """An at-least-once feed (a whole micro-batch redelivered) must
    come out exactly-once: the watermarked stream dedup's output ==
    batch distinct over the duplicated input."""
    import os
    import time

    src = str(tmp_path / "dup_src")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props")
    first = events.orderBy("ts", "event_id").limit(200)
    base = time.time()
    seen: set[str] = set()
    # batch 1: first 200 events; batch 2: the SAME 200 redelivered;
    # batch 3: the rest of the table.
    for k, chunk in enumerate(
            [first, first,
             events.join(first.select("event_id"), "event_id", "left_anti")],
            start=1):
        chunk.coalesce(1).write.mode("append").parquet(src)
        fresh = {f for f in os.listdir(src) if f.endswith(".parquet")} - seen
        seen |= fresh
        for f in fresh:
            os.utime(os.path.join(src, f), (base + k * 10, base + k * 10))

    stream = SE.events_file_stream(spark, src)
    got = _drain(spark, SE.dedup_events_within_watermark(
        stream, watermark="365 days"), "mem_dedup", tmp_path, mode="append")
    expected = SE.dedup_events_within_watermark(spark.read.parquet(src))
    assert got.count() == events.count()
    pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(expected),
                                  check_dtype=False)


def test_foreach_batch_upsert(spark, stream_dir, tmp_path):
    """Micro-batch MERGE accumulation == one-shot batch aggregate."""
    target = str(tmp_path / "user_totals")

    def per_batch_totals(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)")).alias("sum_value"))

    stream = SE.events_file_stream(spark, stream_dir)
    q = SE.start_foreach_batch_upsert(stream, target, str(tmp_path / "ck_fb"),
                                      keys=["user_id"],
                                      aggregate=per_batch_totals)
    q.awaitTermination()

    # the sink must be key-partitioned and multi-file (no coalesce(1)
    # whole-target rewrite)
    import os
    part_dirs = [f for f in os.listdir(target) if f.startswith("part=")]
    assert len(part_dirs) > 1

    got = spark.read.parquet(target)
    expected = per_batch_totals(spark.read.parquet(stream_dir))
    got = got.select("user_id", "n_events",
                     F.col("sum_value").cast("double").alias("sum_value"))
    expected = expected.select("user_id", "n_events",
                               F.col("sum_value").cast("double").alias("sum_value"))
    pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(expected),
                                  check_dtype=False)


def test_stateful_running_totals(spark, stream_dir, tmp_path):
    """applyInPandasWithState: last update per user == batch totals."""
    stream = SE.events_file_stream(spark, stream_dir, max_files_per_trigger=2)
    got = _drain(spark, SE.running_user_totals(stream), "mem_state",
                 tmp_path, mode="update")
    # update mode appends one row per (user, micro-batch); the final
    # state is the row with the max n_events per user.
    final = (got.groupBy("user_id")
             .agg(F.max(F.struct("n_events", "sum_value")).alias("s"))
             .select("user_id", "s.n_events", "s.sum_value"))
    batch = spark.read.parquet(stream_dir)
    expected = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"))
    g = _sorted_pdf(final)
    e = _sorted_pdf(expected)
    # float sums accumulated per-batch vs one shot: compare to 1e-6
    pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False,
                                  atol=1e-5)


def test_watermark_bounds_state(spark, stream_dir, tmp_path):
    """Append-mode windowed agg with a watermark emits only finalized
    windows; with availableNow the final append output must equal the
    batch aggregation for every window older than max(ts) - watermark."""
    stream = SE.events_file_stream(spark, stream_dir)
    agg = SE.tumbling_event_counts(stream, window="1 hour",
                                   watermark="2 hours")
    got = _drain(spark, agg, "mem_wm", tmp_path, mode="append")
    batch = spark.read.parquet(stream_dir)
    cutoff = batch.agg(F.max("ts")).collect()[0][0]
    expected = SE.tumbling_event_counts(batch, window="1 hour").filter(
        F.col("window_start") + 3600
        <= F.unix_timestamp(F.lit(cutoff)) - 7200)
    got_final = got.filter(
        F.col("window_start") + 3600
        <= F.unix_timestamp(F.lit(cutoff)) - 7200)
    pd.testing.assert_frame_equal(_sorted_pdf(got_final),
                                  _sorted_pdf(expected), check_dtype=False)


@pytest.mark.slow  # opt-in lane (r14): endurance/equivalence run
def test_stream_stream_interval_join(spark, stream_dir, tmp_path):
    """Watermarked purchases⋈views interval join: streaming pairs ==
    batch pairs on the same replay."""
    stream = SE.events_file_stream(spark, stream_dir)
    got = _drain(spark, SE.purchase_view_interval_join(stream),
                 "mem_ssj", tmp_path, mode="append")
    expected = SE.purchase_view_interval_join(
        spark.read.parquet(stream_dir))
    pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(expected),
                                  check_dtype=False)


def test_event_rate_anomalies_matches_pandas(spark, sf_dir):
    """Differential vs a pandas recomputation on the real events table:
    same trailing mean/std (sample stddev, current window excluded),
    same NULL-z contract for <2 samples / zero variance."""
    import math

    from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import (  # noqa: E501
        load_table,
    )
    from library_data_warehouse_and_business_analytics_system_spark.streaming.events import (  # noqa: E501
        event_rate_anomalies,
    )
    events = load_table(spark, sf_dir, "events")
    got = event_rate_anomalies(events, trailing=6, z_threshold=2.0).collect()
    assert got, "events table must produce windows"

    pdf = events.toPandas()
    pdf["window_start"] = pdf["ts"].dt.floor("h")
    counts = (pdf.groupby(["event_type", "window_start"])
              .size().rename("n").reset_index()
              .sort_values(["event_type", "window_start"]))
    expected = {}
    for etype, g in counts.groupby("event_type"):
        ns = list(g["n"])
        ws = list(g["window_start"])
        for i in range(len(ns)):
            lo = max(0, i - 6)
            window_vals = ns[lo:i]
            if len(window_vals) >= 2:
                m = sum(window_vals) / len(window_vals)
                var = (sum((x - m) ** 2 for x in window_vals)
                       / (len(window_vals) - 1))
                sd = math.sqrt(var)
                z = (ns[i] - m) / sd if sd > 0 else None
            else:
                z = None
            expected[(etype, ws[i])] = (ns[i], z)
    assert len(got) == len(expected)
    for r in got:
        n, z = expected[(r.event_type, r.window_start)]
        assert r.n_events == n
        if z is None:
            assert r.z is None and r.is_anomaly is False
        else:
            assert math.isclose(r.z, z, rel_tol=1e-9)
            assert r.is_anomaly == (abs(z) >= 2.0)


def test_anomaly_stream_equals_batch_on_finalized_windows(
        spark, sf_dir, stream_dir, tmp_path):
    """The streaming anomaly results must equal the batch twin
    restricted to watermark-finalized windows, and every finalized
    window must be present (nothing silently dropped)."""
    import datetime

    from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import (  # noqa: E501
        load_table,
    )
    stream = SE.events_file_stream(spark, stream_dir, max_files_per_trigger=2)
    results = str(tmp_path / "anomalies")
    q = SE.start_anomaly_stream(stream, results,
                                str(tmp_path / "ckpt"),
                                trailing=6, z_threshold=2.0)
    q.awaitTermination()

    got = {(r.event_type, r.window_start):
           (r.n_events, r.z, r.is_anomaly)
           for r in spark.read.parquet(results).collect()}
    assert got, "stream must finalize windows"

    batch = SE.event_rate_anomalies(
        load_table(spark, sf_dir, "events"),
        trailing=6, z_threshold=2.0).collect()
    max_ts = max(r.ts for r in
                 spark.read.parquet(stream_dir).select("ts").collect())
    cutoff = max_ts - datetime.timedelta(hours=2)
    finalized = {(r.event_type, r.window_start):
                 (r.n_events, r.z, r.is_anomaly) for r in batch
                 if r.window_start + datetime.timedelta(hours=1) <= cutoff}
    assert set(got) == set(finalized)
    for k, (n, z, flag) in finalized.items():
        gn, gz, gflag = got[k]
        assert gn == n and gflag == flag
        assert (z is None and gz is None) or abs(gz - z) < 1e-9


def test_streaming_ewma_equals_batch_on_finalized_days(
        spark, sf_dir, stream_dir, tmp_path):
    """streaming_daily_ewma (append mode, day finalized when a later
    day arrives) == the batch recurrence over per-day sums, for every
    day except each key's LAST (never closed by a future event)."""
    from library_data_warehouse_and_business_analytics_system_spark.operators.timeseries import (
        ewma_scan,
    )

    stream = SE.events_file_stream(spark, stream_dir)
    got = _drain(spark, SE.streaming_daily_ewma(stream), "mem_ewma",
                 tmp_path, mode="append").toPandas()

    batch = spark.read.parquet(stream_dir)
    daily = (batch.groupBy("event_type",
                           F.to_date("ts").alias("day"))
             .agg(F.sum("value").alias("daily_value")))
    ref = ewma_scan(daily, "event_type", "day", "daily_value",
                    alpha=0.5).toPandas()
    # drop each key's last (unfinalized) day from the reference
    last = ref.groupby("event_type")["day"].transform("max")
    ref = ref[ref["day"] < last]

    got["day"] = pd.to_datetime(got["day"], unit="D").dt.date
    g = got.sort_values(["event_type", "day"]).reset_index(drop=True)
    r = ref.sort_values(["event_type", "day"]).reset_index(drop=True)
    assert list(g["event_type"]) == list(r["event_type"])
    assert list(g["day"]) == list(r["day"])
    # float daily sums accumulate in different orders (arrival vs
    # shuffle); the recurrence then mixes them — compare at 1e-6
    assert (abs(g["daily_value"].to_numpy()
                - r["daily_value"].to_numpy()) < 1e-6).all()
    assert (abs(g["ewma"].to_numpy() - r["ewma"].to_numpy()) < 1e-6).all()


@pytest.mark.slow  # opt-in lane (r14): endurance/equivalence run
def test_streaming_ewma_rejects_out_of_order_days(spark, tmp_path):
    """A day older than the pending one must RAISE, not fold silently."""
    import os
    import time

    src = str(tmp_path / "ooo_src")
    rows = [(1, "2024-01-05 00:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-03 00:00:00", 1, "click", 1.0, "{}")]
    base = time.time()
    seen: set[str] = set()
    for k, r in enumerate(rows):
        (spark.createDataFrame([r], "event_id long, ts string, user_id long,"
                               " event_type string, value double, props string")
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("append").parquet(src))
        fresh = {f for f in os.listdir(src) if f.endswith(".parquet")} - seen
        seen |= fresh
        for f in fresh:
            os.utime(os.path.join(src, f), (base + k * 10, base + k * 10))

    stream = SE.events_file_stream(spark, src, max_files_per_trigger=1)
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises((Py4JJavaError, Exception)) as excinfo:
        _drain(spark, SE.streaming_daily_ewma(stream), "mem_ewma_ooo",
               tmp_path, mode="append")
    assert "out-of-order day" in str(excinfo.value)
