"""Session-4 analytics families: EWMA smoothing as a distributed
scan, event-sequence Markov transitions, robust (median/MAD) outlier
detection, and item-item collaborative-filtering similarity.

Reference parity: the reference's reporting layer computes trend and
per-member behaviour summaries over the borrowing fact
(`LQY_query1.txt` quarterly trends, `LQY_query3.txt` member activity
histograms); these four generalize that surface to the smoothing /
sequence / robust-stats / affinity queries an analytics user runs
next, each with a full ANSI-SQL oracle.

Scale posture:
- the EWMA gate runs `operators/timeseries.ewma_scan` — the two-phase
  range scan, never a per-key single reducer;
- the transition matrix's only raw-row window partitions by user_id
  (numerous by construction); the probability normalization windows
  over the already-aggregated T×T frame;
- the outlier gate's medians come from `operators/ranking`'s grouped
  two-phase rank selection — a handful of huge priority groups never
  funnel through one task;
- the CF windows partition by part over co-occurrence candidates
  (bounded by basket-bounded co-purchase degree, not corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranking import group_quantile_disc
from ..operators.timeseries import ewma_scan
from ..sources.catalog import load_table
from .registry import register


# ---------------------------------------------------------------------------
# EWMA over the per-type daily value series.


@register(
    "events_daily_ewma",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, day, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ), rec AS (
      SELECT event_type, day, rn, x, x AS s FROM idx WHERE rn = 1
      UNION ALL
      SELECT i.event_type, i.day, i.rn, i.x,
             CAST(0.5 AS DOUBLE) * r.s + CAST(0.5 AS DOUBLE) * i.x
      FROM idx i JOIN rec r
        ON i.event_type = r.event_type AND i.rn = r.rn + 1
    )
    SELECT event_type, day, x AS daily_value,
           FLOOR(s * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(10000 AS DOUBLE) AS ewma
    FROM rec
    ORDER BY event_type, day
    """,
    operators=("A1", "W1"),
)
def events_daily_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the exact daily value total (decimal sum) and
    its EWMA (alpha=0.5, s_1 = x_1). The smoothing itself is
    `ewma_scan`'s two-phase range scan — the oracle is the textbook
    recursive CTE, so green certifies the distributed decomposition ≡
    the sequential recurrence. Quantization: the carry regrouping is a
    few-ulp reassociation of the float chain, so the output is snapped
    to the 1e-4 grid — with FLOOR(x·1e4 + 0.5)/1e4, pure IEEE ops both
    engines execute identically, NOT ROUND(double): engine ROUND
    algorithms disagree on the exact .00005 midpoints that halving
    chains of decimal-origin values produce constantly (see the verify
    skill's gotchas; the daily input is decimal-rounded to 2dp for the
    same reason)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
                  .alias("_s"))
             .select("event_type", "day",
                     F.col("_s").cast("double").alias("daily_value")))
    # vectorize=False for the same reason as events_daily_holt: the
    # gate pins the distributed decomposition bit-exactly against the
    # sequential CTE; the vectorized rescaled-cumsum fold carries its
    # own 1e-9 differential + hypothesis coverage.
    sm = ewma_scan(daily, "event_type", "day", "daily_value", alpha=0.5,
                   vectorize=False)
    quant = (F.floor(F.col("ewma") * F.lit(10000.0) + F.lit(0.5))
             .cast("double") / F.lit(10000.0))
    return (sm.select("event_type", "day", "daily_value",
                      quant.alias("ewma"))
            .orderBy("event_type", "day"))


# ---------------------------------------------------------------------------
# The PRODUCTION ewma codepath (vectorize=True, the default) under a
# hash-exact gate. events_daily_ewma must pin the scalar fold because
# its decimal-valued series makes the chunked-cumsum reassociation
# visible at the last ulp; THIS gate constructs inputs on which the
# vectorized fold is provably EXACT, so the default codepath faces the
# driver's bit-exact hash too (r8 verdict item 5).


@register(
    "events_daily_ewma_vec",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, day, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ), rec AS (
      SELECT event_type, day, rn, x, x AS s FROM idx WHERE rn = 1
      UNION ALL
      SELECT i.event_type, i.day, i.rn, i.x,
             CAST(0.5 AS DOUBLE) * r.s + CAST(0.5 AS DOUBLE) * i.x
      FROM idx i JOIN rec r
        ON i.event_type = r.event_type AND i.rn = r.rn + 1
    )
    SELECT event_type, day, CAST(x AS BIGINT) AS daily_events, s AS ewma
    FROM rec
    ORDER BY event_type, day
    """,
    operators=("A1", "W1"),
)
def events_daily_ewma_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the daily EVENT COUNT series smoothed by
    `ewma_scan` with its production defaults — ``vectorize=True``
    (chunked rescaled-cumsum fold) and ``mode="auto"`` (5 keys →
    ranged two-phase scan, so the multiplicative carry chain is live).

    Why this can be hash-exact with NO output quantization, where the
    decimal-valued `events_daily_ewma` cannot: every intermediate on
    both engines is an exactly-representable dyadic rational.

    - inputs are integer daily counts < 2^10 (max observed 739 at
      sf0.1), and the series is ≤ 31 points per key (the events table
      spans one month at every SF) — one fold chunk (cap 43 at α=.5);
    - α = 1/2, so every decay power, rescale 2^i, and halving is an
      exact power-of-two scale (error-free in IEEE754);
    - the fold's in-chunk terms x_i·2^(i-1) are exact integers
      ≤ 2^40, so every partial sum — np.cumsum's sequential order,
      np.dot's pairwise order, AND the oracle CTE's step order —
      is an exact integer ≤ 2^45: summation order cannot matter;
    - states are dyadic rationals with denominator ≤ 2^30 and
      numerator ≤ 2^45 (< 2^53): s0 + α·Σ, the block carries
      carry·2^-n + fold, and the scalar recurrence all round to
      themselves.

    Hence vectorized fold ≡ scalar recurrence ≡ the oracle's
    sequential recursive CTE, bit for bit, and the gate certifies the
    code users actually run (the 1e-9 envelope on general floats
    stays pinned by tests/test_timeseries.py)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("daily_events")))
    sm = ewma_scan(daily, "event_type", "day", "daily_events", alpha=0.5)
    return (sm.select("event_type", "day",
                      F.col("daily_events").cast("long")
                      .alias("daily_events"), "ewma")
            .orderBy("event_type", "day"))


# ---------------------------------------------------------------------------
# The scan family's THIRD routing mode (mode="split") under the same
# hash-exact recipe: a composite series key makes two event types
# oversized (full-month daily series) and shards the rest into short
# per-week series, so one ewma_scan call routes hot keys through the
# ranged carry machinery AND the tail through grouped, unions, and
# must still equal the sequential recursive CTE bit for bit (r9
# verdict item 5 - split mode had pytest + probe evidence but no
# driver row).


@register(
    "events_daily_ewma_split",
    """
    WITH RECURSIVE daily AS (
      SELECT CASE WHEN event_type IN ('click', 'error') THEN event_type
                  ELSE event_type || '#w'
                       || CAST((EXTRACT(DAY FROM ts) - 1) // 7 AS VARCHAR)
             END AS skey,
             CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT skey, day, x,
             ROW_NUMBER() OVER (PARTITION BY skey ORDER BY day) AS rn
      FROM daily
    ), rec AS (
      SELECT skey, day, rn, x, x AS s FROM idx WHERE rn = 1
      UNION ALL
      SELECT i.skey, i.day, i.rn, i.x,
             CAST(0.5 AS DOUBLE) * r.s + CAST(0.5 AS DOUBLE) * i.x
      FROM idx i JOIN rec r
        ON i.skey = r.skey AND i.rn = r.rn + 1
    )
    SELECT skey, day, CAST(x AS BIGINT) AS daily_events, s AS ewma
    FROM rec
    ORDER BY skey, day
    """,
    operators=("A1", "W1"),
)
def events_daily_ewma_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ewma_scan(mode="split")` end-to-end under the driver hash: the
    numerous-keys-AND-oversized-keys shape. 'click'/'error' keep their
    whole daily series (30 points, above the gate's split_threshold=25
    at every SF: the events table spans one month) -> routed RANGED
    (two-phase carry chain live); the other three types shard into
    per-week keys (<= 7 points each, ~15 cold keys) -> routed GROUPED
    (per-key hash partition, zero driver state); the union faces the
    oracle's sequential recursive CTE.

    Hash-exactness is events_daily_ewma_vec's dyadic argument
    verbatim: integer daily counts < 2^10, series <= 30 points (one
    fold chunk at alpha=1/2), every power/rescale an exact
    power-of-two scale, all partial sums exact integers < 2^53 - so
    vectorized fold = scalar recurrence = the CTE, bit for bit, on
    BOTH routes and across the ranged blocks' carry handoffs."""
    ev = load_table(spark, sf_dir, "events")
    week = F.floor((F.dayofmonth("ts") - F.lit(1)) / F.lit(7))
    skey = (F.when(F.col("event_type").isin("click", "error"),
                   F.col("event_type"))
            .otherwise(F.concat(F.col("event_type"), F.lit("#w"),
                                week.cast("string"))))
    daily = (ev.groupBy(skey.alias("skey"), F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("daily_events")))
    sm = ewma_scan(daily, "skey", "day", "daily_events", alpha=0.5,
                   mode="split", split_threshold=25)
    return (sm.select("skey", "day",
                      F.col("daily_events").cast("long")
                      .alias("daily_events"), "ewma")
            .orderBy("skey", "day"))


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event sequences.


@register(
    "event_type_transitions",
    """
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ), counts AS (
      SELECT event_type, next_type, COUNT(*) AS n_pairs
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n_pairs,
           CAST(n_pairs AS DOUBLE)
             / CAST(SUM(n_pairs) OVER (PARTITION BY event_type) AS DOUBLE)
             AS prob
    FROM counts
    ORDER BY event_type, next_type
    """,
    operators=("W1", "A1"),
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(next event type | current type) from per-user event order —
    the sequence-mining summary behind session-flow dashboards and
    synthetic-session generators. The raw-row window partitions by
    user_id (numerous); normalization runs over the T×T aggregate.
    prob = int/int in doubles: correctly-rounded division on exact
    counts, bit-identical cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select("user_id", "ts", "event_id", "event_type")
             .withColumn("next_type", F.lead("event_type").over(w))
             .filter(F.col("next_type").isNotNull()))
    counts = (pairs.groupBy("event_type", "next_type")
              .agg(F.count(F.lit(1)).alias("n_pairs")))
    tot = Window.partitionBy("event_type")
    return (counts
            .withColumn("prob",
                        F.col("n_pairs").cast("double")
                        / F.sum("n_pairs").over(tot).cast("double"))
            .orderBy("event_type", "next_type"))


# ---------------------------------------------------------------------------
# Robust outlier detection: median / MAD per order priority.


@register(
    "order_price_outliers",
    """
    WITH o AS (
      SELECT o_orderpriority AS g, o_totalprice AS x, o_orderkey AS k
      FROM orders
    ), med AS (
      SELECT g, x AS med FROM (
        SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, k) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM o) WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)
    ), d AS (
      SELECT o.g, o.x, o.k, ABS(o.x - med.med) AS dev, med.med
      FROM o JOIN med USING (g)
    ), mad AS (
      SELECT g, dev AS mad FROM (
        SELECT g, dev,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY dev, k) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM d) WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)
    )
    SELECT g AS o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(CASE WHEN dev > 3.0 * mad THEN 1 END) AS n_outliers,
           MAX(CASE WHEN dev > 3.0 * mad THEN x END) AS max_outlier_price,
           MAX(med) AS median_price,
           MAX(mad) AS mad
    FROM d JOIN mad USING (g)
    GROUP BY g
    ORDER BY g
    """,
    operators=("A1", "W2", "J1"),
)
def order_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per priority: lower median, MAD (median absolute deviation),
    and the |x - med| > 3·MAD outlier census — the robust anomaly
    screen that, unlike z-scores, a few extreme rows can't poison.
    Both medians are `group_quantile_disc` rank SELECTIONS over the
    grouped two-phase rank (5 huge groups, no per-group single
    reducer); selection does no value arithmetic, and dev/3·MAD are
    single correctly-rounded IEEE ops — raw doubles hash-match."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    # The per-priority medians are BOUNDED driver aggregates (≤5 rows
    # — the priority domain), so they ride back as literal maps
    # instead of broadcast joins (r13 s3, guide §1.2): the join form
    # re-executed each median's rank-selection subtree in every
    # downstream branch (mad's range-sample, mad's checkpoint, the
    # final census — 33 Spark jobs for this query), while the literal
    # lookup costs nothing per branch. collect→F.lit round-trips the
    # exact IEEE doubles, so every downstream comparison and the
    # final hash are unchanged. The quantiles themselves stay the
    # two-phase grouped rank selection — the 100 TB shape.
    # Both ≤5-row collects run under no_aqe (r14, guide §1.2): every
    # join in the selection is explicitly broadcast (off_df, sizes),
    # so AQE only added stage-materialization jobs per collect.
    from ..session import no_aqe

    with no_aqe(spark):
        med_rows = group_quantile_disc(
            orders, ["o_orderpriority"], "o_totalprice", "o_orderkey",
            q=0.5, out_col="median_price").collect()
    med_map = F.create_map(*[
        lit for r in med_rows
        for lit in (F.lit(r["o_orderpriority"]), F.lit(r["median_price"]))])
    dev = (orders
           .withColumn("median_price", med_map[F.col("o_orderpriority")])
           .withColumn("dev", F.abs(F.col("o_totalprice")
                                    - F.col("median_price"))))
    with no_aqe(spark):
        mad_rows = group_quantile_disc(
            dev.select("o_orderpriority", "dev", "o_orderkey"),
            ["o_orderpriority"], "dev", "o_orderkey", q=0.5,
            out_col="mad").collect()
    mad_map = F.create_map(*[
        lit for r in mad_rows
        for lit in (F.lit(r["o_orderpriority"]), F.lit(r["mad"]))])
    flagged = (dev.withColumn("mad", mad_map[F.col("o_orderpriority")])
               .withColumn("is_out", F.col("dev") > 3.0 * F.col("mad")))
    return (flagged.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.count(F.when(F.col("is_out"), 1)).alias("n_outliers"),
                 F.max(F.when(F.col("is_out"), F.col("o_totalprice")))
                 .alias("max_outlier_price"),
                 F.max("median_price").alias("median_price"),
                 F.max("mad").alias("mad"))
            .orderBy("o_orderpriority"))


# ---------------------------------------------------------------------------
# Item-item collaborative filtering: cosine similarity over baskets.


@register(
    "item_cf_similar_parts",
    """
    WITH bi AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_item AS (
      SELECT l_partkey, COUNT(*) AS n_ord FROM bi GROUP BY l_partkey
    ), co AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_co
      FROM bi a JOIN bi b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ), sym AS (
      SELECT p1 AS part, p2 AS partner, n_co FROM co
      UNION ALL
      SELECT p2 AS part, p1 AS partner, n_co FROM co
    ), scored AS (
      SELECT s.part, s.partner, s.n_co,
             CAST(s.n_co AS DOUBLE)
               / SQRT(CAST(ni.n_ord * nj.n_ord AS DOUBLE)) AS cosine
      FROM sym s
      JOIN n_item ni ON ni.l_partkey = s.part
      JOIN n_item nj ON nj.l_partkey = s.partner
    )
    SELECT part, partner, n_co, cosine, rnk FROM (
      SELECT part, partner, n_co, cosine,
             ROW_NUMBER() OVER (
               PARTITION BY part ORDER BY cosine DESC, partner) AS rnk
      FROM scored)
    WHERE rnk <= 5
    ORDER BY part, rnk
    """,
    operators=("J1", "A1", "O3"),
)
def item_cf_similar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most-similar parts per part by basket cosine
    (co-orders / sqrt(n_i · n_j)) — item-item collaborative filtering,
    the classic recommendations primitive (Sarwar et al. 2001, WWW).
    The pair join is keyed on the order id, so fan-out is bounded by
    basket size squared, never catalog size squared; the top-5 is
    TWO-PHASE (each partition emits its own top-5 per part first, the
    global window sees only that bounded candidate set — lossless, the
    srp_diverse_sample shape) so a hyper-popular part's full candidate
    list is never sorted on one reducer. cosine = int / sqrt(int): two
    correctly-rounded IEEE ops over exact integers — raw doubles
    hash-match the oracle."""
    # Basket-grouped pair generation (r13, guide §2.4): the order's
    # item set is collected ONCE (one exchange, basket-bounded) and
    # feeds both the per-part order counts and the JVM HOF pair
    # expansion — the previous shape paid the (l_orderkey, l_partkey)
    # DISTINCT shuffle plus both sides of a self-join. collect_set
    # de-dups within the order exactly as the DISTINCT did, so n_ord,
    # n_co, and every cosine are identical (verified vs the oracle).
    # localCheckpoint: order-count rows, two consumers below.
    baskets = (load_table(spark, sf_dir, "lineitem")
               .select("l_orderkey", "l_partkey")
               .groupBy("l_orderkey")
               .agg(F.collect_set("l_partkey").alias("ps"))
               .localCheckpoint())
    n_item = (baskets.select(F.explode("ps").alias("l_partkey"))
              .groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_ord")))
    co = (baskets
          .select(F.explode(F.flatten(F.transform(
              F.col("ps"), lambda pa: F.transform(
                  F.filter(F.col("ps"), lambda pb: pb > pa),
                  lambda pb: F.struct(pa.alias("p1"), pb.alias("p2")))))
          ).alias("e"))
          .groupBy(F.col("e.p1").alias("p1"), F.col("e.p2").alias("p2"))
          .agg(F.count(F.lit(1)).alias("n_co")))
    sym = (co.select(F.col("p1").alias("part"), F.col("p2").alias("partner"),
                     "n_co")
           .unionAll(co.select(F.col("p2").alias("part"),
                               F.col("p1").alias("partner"), "n_co")))
    ni = n_item.select(F.col("l_partkey").alias("part"),
                       F.col("n_ord").alias("_ni"))
    nj = n_item.select(F.col("l_partkey").alias("partner"),
                       F.col("n_ord").alias("_nj"))
    scored = (sym.join(ni, "part").join(nj, "partner")
              .withColumn("cosine",
                          F.col("n_co").cast("double")
                          / F.sqrt((F.col("_ni") * F.col("_nj"))
                                   .cast("double"))))
    pre = scored.withColumn("_pid", F.spark_partition_id())
    wp = (Window.partitionBy("_pid", "part")
          .orderBy(F.col("cosine").desc(), "partner"))
    cand = (pre.withColumn("_pr", F.row_number().over(wp))
            .filter(F.col("_pr") <= 5))
    w = Window.partitionBy("part").orderBy(F.col("cosine").desc(), "partner")
    return (cand.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("part", "partner", "n_co", "cosine",
                    F.col("rnk").cast("long").alias("rnk"))
            .orderBy("part", "rnk"))


# ---------------------------------------------------------------------------
# Rate-anomaly detection gate for the existing batch/streaming twin.


@register(
    "event_rate_anomalies",
    """
    WITH counts AS (
      SELECT event_type, date_trunc('hour', ts) AS window_start,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ), scored AS (
      SELECT event_type, window_start, n_events,
             AVG(n_events) OVER w AS m,
             STDDEV_SAMP(n_events) OVER w AS s
      FROM counts
      WINDOW w AS (PARTITION BY event_type ORDER BY window_start
                   ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, window_start, n_events,
           FLOOR(m * 1000000 + CAST(0.5 AS DOUBLE)) / 1000000
             AS baseline_mean,
           FLOOR(s * 1000000 + CAST(0.5 AS DOUBLE)) / 1000000
             AS baseline_std,
           FLOOR((CASE WHEN s > 0 THEN (n_events - m) / s END) * 1000000
                 + CAST(0.5 AS DOUBLE)) / 1000000 AS z,
           COALESCE(ABS(FLOOR((CASE WHEN s > 0 THEN (n_events - m) / s END)
                              * 1000000 + CAST(0.5 AS DOUBLE)) / 1000000)
                    >= CAST(2.0 AS DOUBLE), FALSE) AS is_anomaly
    FROM scored
    ORDER BY event_type, window_start
    """,
    operators=("A1", "W1"),
)
def event_rate_anomalies_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for `streaming/events.event_rate_anomalies` (whose
    streaming twin is pytest-pinned to it): hourly counts per type
    scored against the trailing-6-window mean/stddev. The windows run
    over the already-aggregated (type, hour) frame — per-type state is
    `trailing` rows regardless of event volume. Engines disagree on
    stddev association order at the last ulp, so the gate snaps the
    float columns to the 1e-6 grid with FLOOR(x·1e6 + 0.5)/1e6 — pure
    IEEE ops both engines execute identically (never ROUND(double):
    engine rounding algorithms diverge on midpoints) — and derives the
    flag from the QUANTIZED z. The operator itself flags on raw z; the
    pandas differential in tests/test_streaming.py pins that."""
    from ..streaming.events import event_rate_anomalies as _op

    ev = load_table(spark, sf_dir, "events")
    raw = _op(ev, window="1 hour", trailing=6, z_threshold=2.0)

    def quant(c):
        return (F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("double")
                / F.lit(1000000.0))

    qz = quant(F.col("z"))
    return (raw.select(
        "event_type", "window_start", "n_events",
        quant(F.col("baseline_mean")).alias("baseline_mean"),
        quant(F.col("baseline_std")).alias("baseline_std"),
        qz.alias("z"),
        F.coalesce(F.abs(qz) >= 2.0, F.lit(False)).alias("is_anomaly"))
        .orderBy("event_type", "window_start"))


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing over the same daily series.


@register(
    "events_daily_holt",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, day, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ), rec AS (
      SELECT event_type, day, rn, x, x AS l, CAST(0 AS DOUBLE) AS b
      FROM idx WHERE rn = 1
      UNION ALL
      SELECT i.event_type, i.day, i.rn, i.x,
             CAST(0.5 AS DOUBLE) * (r.l + r.b)
               + CAST(0.5 AS DOUBLE) * i.x,
             CAST(0.5 AS DOUBLE)
               * ((CAST(0.5 AS DOUBLE) * (r.l + r.b)
                   + CAST(0.5 AS DOUBLE) * i.x) - r.l)
               + CAST(0.5 AS DOUBLE) * r.b
      FROM idx i JOIN rec r
        ON i.event_type = r.event_type AND i.rn = r.rn + 1
    )
    SELECT event_type, day, x AS daily_value,
           FLOOR(l * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(10000 AS DOUBLE) AS level,
           FLOOR(b * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(10000 AS DOUBLE) AS trend,
           FLOOR((l + b) * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(10000 AS DOUBLE) AS forecast_next
    FROM rec
    ORDER BY event_type, day
    """,
    operators=("A1", "W1"),
)
def events_daily_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing (level + trend + one-step
    forecast) per event type over the daily value series — the
    trend-aware sibling of `events_daily_ewma`, run by
    `operators/timeseries.holt_scan`: the recurrence is affine in the
    (level, trend) state, so blocks compose as Mⁿ·s + u (Blelloch-scan
    algebra) and the per-key timeline spreads over every range
    partition it covers. The oracle is the textbook mutually-recursive
    CTE; both sides snap to the 1e-4 grid with the pure-IEEE floor
    quantizer (the matrix-carry regrouping is a few-ulp reassociation,
    and ROUND(double) diverges between engines on midpoints)."""
    from ..operators.timeseries import holt_scan

    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
                  .alias("_s"))
             .select("event_type", "day",
                     F.col("_s").cast("double").alias("daily_value")))
    # vectorize=False: the gate pins the DISTRIBUTED DECOMPOSITION
    # (two-phase blocks + matrix carries ≡ the oracle's sequential
    # recurrence) with the exact scalar fold — the vectorized eigen
    # fold reassociates a few more ulps, enough to flip a floor-grid
    # boundary row (one row at sf0.001 in round 8), and SQL cannot
    # reproduce that reassociation; the vectorized path is pinned at
    # 1e-9 by tests/test_timeseries.py + hypothesis instead.
    sm = holt_scan(daily, "event_type", "day", "daily_value",
                   alpha=0.5, gamma=0.5, vectorize=False)

    def quant(c):
        return (F.floor(c * F.lit(10000.0) + F.lit(0.5)).cast("double")
                / F.lit(10000.0))

    return (sm.select("event_type", "day", "daily_value",
                      quant(F.col("level")).alias("level"),
                      quant(F.col("trend")).alias("trend"),
                      quant(F.col("level") + F.col("trend"))
                      .alias("forecast_next"))
            .orderBy("event_type", "day"))


# ---------------------------------------------------------------------------
# Chi-square independence test: event type × ISO weekday.


@register(
    "event_type_weekday_chisq",
    """
    WITH cells AS (
      SELECT event_type, isodow(ts) AS dow, COUNT(*) AS observed
      FROM events GROUP BY 1, 2
    ), rowt AS (
      SELECT event_type, SUM(observed) AS rt FROM cells GROUP BY 1
    ), colt AS (
      SELECT dow, SUM(observed) AS ct FROM cells GROUP BY 1
    ), tot AS (
      SELECT SUM(observed) AS n,
             (SELECT COUNT(*) FROM rowt) AS r,
             (SELECT COUNT(*) FROM colt) AS c
      FROM cells
    ), d AS (
      SELECT cells.event_type, cells.dow, cells.observed,
             CAST(rowt.rt * colt.ct AS DOUBLE) / CAST(tot.n AS DOUBLE)
               AS expected
      FROM cells
      JOIN rowt USING (event_type)
      JOIN colt USING (dow)
      CROSS JOIN tot
    ), d2 AS (
      SELECT *,
             (CAST(observed AS DOUBLE) - expected)
               * (CAST(observed AS DOUBLE) - expected) / expected AS contrib
      FROM d
    )
    SELECT d2.event_type, d2.dow, d2.observed, d2.expected, d2.contrib,
           (SELECT list_reduce(
              list_prepend(CAST(0 AS DOUBLE),
                           list(contrib ORDER BY event_type, dow)),
              (a, b) -> a + b) FROM d2) AS chi2,
           (SELECT (r - 1) * (c - 1) FROM tot) AS dof
    FROM d2
    ORDER BY d2.event_type, d2.dow
    """,
    operators=("A1", "J1", "J5"),
)
def event_type_weekday_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test over the event-type ×
    ISO-weekday contingency table — the statistical screen behind
    'does traffic mix shift by weekday' dashboards and drift monitors.
    Everything reduces over the T×7 CELL frame (two tiny re-aggregates
    + two 1-row broadcast scalars), so the fact is scanned and
    shuffled exactly once regardless of volume. Exactness: expected =
    rt·ct/n and each cell's contribution are single correctly-rounded
    IEEE expressions over exact integers, and the chi² total folds the
    contributions in (event_type, dow) order on BOTH engines
    (array_sort + aggregate here, list ORDER BY + list_reduce there) —
    the sorted-fold trick the search gates established for
    order-dependent double sums. Raw doubles, no quantization."""
    ev = load_table(spark, sf_dir, "events")
    cells = (ev.select("event_type",
                       ((F.dayofweek("ts") + 5) % 7 + 1).alias("dow"))
             .groupBy("event_type", "dow")
             .agg(F.count(F.lit(1)).alias("observed")))
    cells = cells.localCheckpoint()  # reused 4x below; freeze once
    rowt = cells.groupBy("event_type").agg(F.sum("observed").alias("rt"))
    colt = cells.groupBy("dow").agg(F.sum("observed").alias("ct"))
    tot = cells.agg(
        F.sum("observed").alias("n"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("c"))
    d = (cells.join(F.broadcast(rowt), "event_type")
         .join(F.broadcast(colt), "dow")
         .join(F.broadcast(tot)))
    obs = F.col("observed").cast("double")
    expected = ((F.col("rt") * F.col("ct")).cast("double")
                / F.col("n").cast("double"))
    d2 = (d.withColumn("expected", expected)
          .withColumn("contrib", (obs - F.col("expected"))
                      * (obs - F.col("expected")) / F.col("expected"))
          .withColumn("dof", ((F.col("r") - 1) * (F.col("c") - 1))
                      .cast("long")))
    chi2 = d2.agg(
        F.aggregate(
            F.array_sort(F.collect_list(
                F.struct("event_type", "dow", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"]).alias("chi2"))
    return (d2.join(F.broadcast(chi2))
            .select("event_type", "dow", "observed", "expected",
                    "contrib", "chi2", "dof")
            .orderBy("event_type", "dow"))


# ---------------------------------------------------------------------------
# CUSUM change-point statistics over the daily series.


@register(
    "events_daily_cusum",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS xd
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type,
             CAST(SUM(xd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu
      FROM daily GROUP BY 1
    ), d AS (
      SELECT daily.event_type, daily.day,
             CAST(xd AS DOUBLE) AS daily_value,
             CAST(xd AS DOUBLE) - m.mu AS dev
      FROM daily JOIN m USING (event_type)
    ), p AS (
      SELECT *, SUM(dev) OVER (
        PARTITION BY event_type ORDER BY day) AS ps
      FROM d
    ), ext AS (
      SELECT *,
             MIN(ps) OVER (PARTITION BY event_type ORDER BY day) AS pmin,
             MAX(ps) OVER (PARTITION BY event_type ORDER BY day) AS pmax
      FROM p
    )
    SELECT event_type, day, daily_value,
           FLOOR((ps - LEAST(CAST(0 AS DOUBLE), pmin))
                 * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(10000 AS DOUBLE) AS pos_cusum,
           FLOOR((GREATEST(CAST(0 AS DOUBLE), pmax) - ps)
                 * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(10000 AS DOUBLE) AS neg_cusum
    FROM ext
    ORDER BY event_type, day
    """,
    operators=("A1", "W1"),
)
def events_daily_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM statistics per event type: the classic
    change-point detector, via the identity
    max(0, s_{t-1} + d_t) == P_t − min(0, min_{j≤t} P_j) — prefix sums
    and prefix extrema of the demeaned series, which is exactly
    `operators/timeseries.cumsum_scan`'s two-phase additive scan (a
    key's whole timeline never sorts on one reducer; the oracle uses
    plain SQL running windows). Both engines regroup the float prefix
    sums differently (two-phase carries here, segment trees there), so
    the outputs snap to the 1e-4 floor grid like the other scans."""
    from ..operators.timeseries import cumsum_scan

    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
                  .alias("xd")))
    mu = (daily.groupBy("event_type")
          .agg((F.sum("xd").cast("double")
                / F.count(F.lit(1)).cast("double")).alias("mu")))
    d = (daily.join(mu, "event_type")
         .select("event_type", "day",
                 F.col("xd").cast("double").alias("daily_value"),
                 (F.col("xd").cast("double") - F.col("mu")).alias("dev")))
    sc = cumsum_scan(d.select("event_type", "day", "dev"),
                     "event_type", "day", "dev")

    def quant(c):
        return (F.floor(c * F.lit(10000.0) + F.lit(0.5)).cast("double")
                / F.lit(10000.0))

    joined = sc.join(d.select("event_type", "day", "daily_value"),
                     ["event_type", "day"])
    return (joined.select(
        "event_type", "day", "daily_value",
        quant(F.col("run_sum")
              - F.least(F.lit(0.0), F.col("run_min"))).alias("pos_cusum"),
        quant(F.greatest(F.lit(0.0), F.col("run_max"))
              - F.col("run_sum")).alias("neg_cusum"))
        .orderBy("event_type", "day"))
