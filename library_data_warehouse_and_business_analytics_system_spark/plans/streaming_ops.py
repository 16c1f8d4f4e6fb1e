"""Batch twins of the Structured Streaming operators.

``F.window`` / ``F.session_window`` evaluate identically on batch and
streaming DataFrames, so each streaming aggregation in
``streaming/events.py`` registers here as a batch query with a DuckDB
oracle (integer epoch-bucket math reproduces Spark's window assignment
tz-independently). The streaming tests then assert stream == batch on
the same input — together that oracle-checks the streaming semantics.

Reference anchor: the reference has no streaming (SURVEY.md §2.9); its
incremental MERGE loads (07_SubsequentLoading.sql:324-435) map to the
foreachBatch upsert exercised in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table
from ..streaming.events import (session_window_stats, sliding_event_counts,
                                tumbling_event_counts)
from .registry import register


@register(
    "events_tumbling_hourly",
    """
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    operators=("STREAM-TUMBLING", "A1"),
    bench=True,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return tumbling_event_counts(events, window="1 hour") \
        .orderBy("window_start", "event_type")


@register(
    "events_sliding_1h30m",
    """
    SELECT CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
             - g.k * 1800 AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events CROSS JOIN (VALUES (0), (1)) AS g(k)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    operators=("STREAM-SLIDING", "A1", "J5"),
)
def events_sliding_1h30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event belongs to the
    two half-hour-aligned windows covering it — the oracle materializes
    exactly those two window starts per event."""
    events = load_table(spark, sf_dir, "events")
    return sliding_event_counts(events, window="1 hour", slide="30 minutes") \
        .orderBy("window_start", "event_type")


@register(
    "events_session_windows",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                    OR epoch(ts) - epoch(prev_ts) >= 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
           CAST(floor(epoch(MAX(ts))) AS BIGINT) AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    operators=("STREAM-SESSION", "W1", "A1"),
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window in batch mode vs a LAG+running-SUM oracle. A new
    session starts when the gap to the previous event is >= 30 min
    (Spark merges an event only while ts < previous-window end)."""
    events = load_table(spark, sf_dir, "events")
    return session_window_stats(events, gap="30 minutes") \
        .orderBy("user_id", "session_start")


@register(
    "events_interval_join",
    """
    SELECT a.event_id, a.user_id,
           COUNT(b.event_id) AS n_views_before,
           CAST(COALESCE(SUM(CAST(b.value AS DECIMAL(20,6))), 0) AS DOUBLE)
             AS view_value_before
    FROM events a
    LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.event_type = 'view'
     AND b.ts >= a.ts - INTERVAL 30 MINUTE
     AND b.ts < a.ts
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id, a.user_id
    ORDER BY a.event_id
    """,
    operators=("STREAM-INTERVAL-JOIN", "J7", "A1"),
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bound self-join (the batch twin of a stream-stream interval
    join): each purchase joined to the same user's views in the
    preceding 30 minutes. The equi key (user_id) carries the shuffle;
    the time bound is a join residual — the same plan shape Spark uses
    for watermarked stream-stream joins, where the bound also limits
    state retention."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"), F.col("event_id").alias("v_id"))
    joined = purchases.join(
        views,
        (purchases.user_id == views.v_user)
        & (views.v_ts >= purchases.ts - F.expr("INTERVAL 30 MINUTE"))
        & (views.v_ts < purchases.ts),
        "left")
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.count("v_id").alias("n_views_before"),
             F.coalesce(F.sum(F.col("v_value").cast("decimal(20,6)")),
                        F.lit(0).cast("decimal(20,6)")).cast("double")
             .alias("view_value_before"))
        .orderBy("event_id")
    )


@register(
    "events_funnel",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(ts) FILTER (event_type = 'view') AS first_view,
             MIN(ts) FILTER (event_type = 'click') AS first_click,
             MIN(ts) FILTER (event_type = 'purchase') AS first_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN first_view IS NULL THEN 'none'
                WHEN first_click > first_view THEN
                  CASE WHEN first_purchase > first_click THEN 'purchase'
                       ELSE 'click' END
                ELSE 'view' END AS funnel_stage
    FROM per_user
    ORDER BY user_id
    """,
    operators=("A2", "EVENTS-FUNNEL"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase) per user via ONE
    conditional-min aggregate over the event stream — no self-joins,
    no windows: the 100 TB shape is a single shuffle on user_id with
    map-side partial mins. Stage semantics: a later stage counts only
    if its first occurrence is strictly after the previous stage's
    first occurrence (NULL comparisons fall through, identical
    three-valued logic in both engines)."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    per_user = events.groupBy("user_id").agg(
        first_ts("view").alias("first_view"),
        first_ts("click").alias("first_click"),
        first_ts("purchase").alias("first_purchase"))
    return (
        per_user.select(
            "user_id",
            F.when(F.col("first_view").isNull(), "none")
            .when(F.col("first_click") > F.col("first_view"),
                  F.when(F.col("first_purchase") > F.col("first_click"),
                         "purchase").otherwise("click"))
            .otherwise("view").alias("funnel_stage"))
        .orderBy("user_id")
    )


@register(
    "events_asof_purchase_view",
    """
    WITH v AS (
      SELECT user_id, ts, MAX(event_id) AS view_event_id
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ), p AS (
      SELECT event_id AS purchase_event_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_event_id,
           p.user_id,
           v.view_event_id,
           CAST(date_diff('microsecond', v.ts, p.ts) AS BIGINT) AS gap_us
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY purchase_event_id
    """,
    operators=("ASOF-JOIN", "W1", "J2"),
)
def events_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: every purchase joined to the user's most
    recent prior-or-same-instant view (`operators/asof.py`,
    sort-merge/carry-forward formulation — one shuffle on user_id,
    linear in rows, versus the exploding non-equi range join). The
    oracle is DuckDB's NATIVE ASOF JOIN on tie-deduped views, so a
    green row certifies the operator against a reference as-of
    implementation, including unmatched-left NULL semantics."""
    from pyspark.sql import functions as F

    from ..operators.asof import asof_join_backward

    events = load_table(spark, sf_dir, "events")
    views = (events.filter(F.col("event_type") == "view")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("view_event_id")))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_event_id"),
                         "user_id", "ts"))
    joined = asof_join_backward(purchases, views, on="user_id",
                                ts_col="ts", payload_cols=["view_event_id"])
    return (
        joined.select(
            "purchase_event_id", "user_id", "view_event_id",
            F.timestamp_diff("MICROSECOND", F.col("ts_matched"),
                             F.col("ts")).cast("long").alias("gap_us"))
        .orderBy("purchase_event_id")
    )


# ---------------------------------------------------------------------------
# Semi-structured props via TYPED struct parsing (round-5).  The
# sibling `events_json_extract` (core_sql2) uses per-path
# `get_json_object`, which re-parses the document once per extracted
# field; this variant parses ONCE with `from_json` + explicit schema —
# the shape to use when several fields are pulled from the same JSON
# column at scale.  Both stay inside whole-stage codegen (never a
# Python UDF).  Malformed documents yield NULL on the Spark side
# (PERMISSIVE); DuckDB's json_extract_string would instead error on
# truly invalid JSON, so the oracle parity claim covers well-formed
# payloads (which the gate corpus guarantees) — a dirty-data pipeline
# would pre-quarantine via sources/io.py before this parse.


@register(
    "events_json_props",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS DOUBLE)
             / COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    operators=("JSON-EXTRACT", "A1", "P1"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    per_type = (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.count("k").alias("n_with_k"),
             F.sum("k").cast("bigint").alias("sum_k"),
             F.min("k").cast("bigint").alias("min_k"),
             F.max("k").cast("bigint").alias("max_k"),
             (F.sum("k").cast("double") / F.count("k")).alias("avg_k"))
    )
    return per_type.orderBy("event_type")


@register(
    "events_gapfill_interpolate",
    r"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1
    ), spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS d
      FROM bounds
    ), fullsp AS (
      SELECT s.user_id, s.d, dl.v
      FROM spine s LEFT JOIN daily dl USING (user_id, d)
    ), marked AS (
      SELECT user_id, d, v,
        LAST_VALUE(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        FIRST_VALUE(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY d
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY d
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM fullsp
    )
    SELECT user_id, strftime(d, '%Y-%m-%d') AS d,
      CAST(CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv)
                     * (CAST(datediff('day', pd, d) AS DOUBLE)
                        / CAST(datediff('day', pd, nd) AS DOUBLE))
           END AS DOUBLE) AS v_filled,
      (v IS NULL) AS was_gap
    FROM marked ORDER BY user_id, d
    """,
    operators=("TS-GAPFILL", "W1", "J2", "S9"),
)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series regularization over the event log: per user, the dense
    day spine from first to last activity with daily event counts,
    holes filled by linear interpolation between the nearest observed
    days (flat at the edges). The count series is integer-derived, so
    interpolation is the only floating arithmetic and both engines
    evaluate the IDENTICAL expression — bit-exact.
    (operators/timeseries.gapfill_interpolate)"""
    from pyspark.sql import functions as F

    from ..operators.timeseries import gapfill_interpolate

    events = load_table(spark, sf_dir, "events")
    daily = (events.groupBy("user_id", F.to_date("ts").alias("d"))
             .agg(F.count(F.lit(1)).cast("double").alias("v")))
    return (gapfill_interpolate(daily, "user_id", "d", "v")
            .withColumn("d", F.date_format("d", "yyyy-MM-dd"))
            .orderBy("user_id", "d"))


@register(
    "events_ohlc_15m",
    """
    SELECT event_type,
           CAST(floor(epoch(time_bucket(INTERVAL '15 minutes', ts)))
                AS BIGINT) AS bucket_start,
           CAST(arg_min(value, epoch(ts) * 1000000 + event_id) AS DOUBLE)
             AS open,
           CAST(MAX(value) AS DOUBLE) AS high,
           CAST(MIN(value) AS DOUBLE) AS low,
           CAST(arg_max(value, epoch(ts) * 1000000 + event_id) AS DOUBLE)
             AS close,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type, bucket_start
    ORDER BY event_type, bucket_start
    """,
    operators=("STREAM-OHLC", "A1", "A2"),
)
def events_ohlc_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the time-series rollup every metrics
    pipeline runs: per (event_type, 15-min bucket) the first/max/min/
    last `value`. ONE two-phase hash aggregate (min_by/max_by carry
    the open/close — no window function, no second shuffle, no sort),
    the shape that scales to any event volume. Ties on ts are broken
    by event_id through a composite bigint ordering key, so first/last
    are deterministic on both engines. Streaming twin: identical agg
    behind a watermarked `F.window` groupBy."""
    from pyspark.sql import functions as F

    from ..streaming.events import ohlc_bars

    events = load_table(spark, sf_dir, "events")
    return (
        ohlc_bars(events, window="15 minutes")
        .select("event_type", F.col("bucket_start").cast("bigint")
                .alias("bucket_start"),
                "open", "high", "low", "close", "n_events")
        .orderBy("event_type", "bucket_start")
    )
