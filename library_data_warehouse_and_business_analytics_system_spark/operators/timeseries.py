"""Time-series gap filling with linear interpolation — the series
regularization pass a training pipeline runs over event/sensor
streams before windowed featurization (models want a dense, evenly
spaced series; raw logs have holes).

Per series key: build the contiguous day spine from the key's own
first to last observation, left-join the observed values, and fill
each hole by linear interpolation between the nearest observed
values on either side (flat extrapolation at the edges, where only
one side exists).

Scale shape: everything is per-key — the spine explode is bounded by
each key's own date range, and the prev/next scans are two
``Window.partitionBy(key)`` passes (``last(ignorenulls)`` forward,
``first(ignorenulls)`` backward), so no global window and no
single-reducer sort; keys are numerous by construction (that's what
makes it a series table). Interpolation is plain IEEE arithmetic over
day offsets, so a SQL engine computing the identical expression
matches bit-for-bit — the driver gate `events_gapfill_interpolate`
relies on exactly that.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_interpolate(df: DataFrame, key_col: str, date_col: str,
                        val_col: str) -> DataFrame:
    """``(key_col, date_col, v_filled, was_gap)`` on the dense per-key
    day spine; ``df`` must hold one row per (key, date)."""
    bounds = (df.groupBy(key_col)
              .agg(F.min(date_col).alias("_d0"),
                   F.max(date_col).alias("_d1")))
    spine = bounds.select(
        key_col, F.explode(F.sequence("_d0", "_d1")).alias(date_col))
    full = spine.join(df, [key_col, date_col], "left")

    w_prev = (Window.partitionBy(key_col).orderBy(date_col)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_next = (Window.partitionBy(key_col).orderBy(date_col)
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    v = F.col(val_col)
    obs_d = F.when(v.isNotNull(), F.col(date_col))
    pv = F.last(v, ignorenulls=True).over(w_prev)
    pd_ = F.last(obs_d, ignorenulls=True).over(w_prev)
    nv = F.first(v, ignorenulls=True).over(w_next)
    nd = F.first(obs_d, ignorenulls=True).over(w_next)

    interp = (pv + (nv - pv)
              * (F.datediff(F.col(date_col), pd_).cast("double")
                 / F.datediff(nd, pd_).cast("double")))
    filled = (F.when(v.isNotNull(), v)
              .when(pv.isNull(), nv)       # leading edge: flat from next
              .when(nv.isNull(), pv)       # trailing edge: flat from prev
              .otherwise(interp))
    return full.select(
        key_col, date_col,
        filled.cast("double").alias("v_filled"),
        v.isNull().alias("was_gap"))


# ---------------------------------------------------------------------------
# Exponentially weighted moving average as a DISTRIBUTED SCAN.
#
# The recurrence s_1 = x_1, s_t = (1-α)·s_{t-1} + α·x_t is the textbook
# smoothing pass every monitoring / forecasting pipeline runs over its
# series, and the naive Spark expression — a window ordered by time —
# either doesn't exist (no recursive window functions) or collapses a
# key onto one reducer via applyInPandas(key). This is the same
# single-reducer trap packing/surrogate/ranking already solve with the
# two-phase range shape, applied to a scan with a MULTIPLICATIVE carry:
#
#   1. repartitionByRange on (key, t): each partition holds a
#      contiguous slice of each key's timeline; localCheckpoint
#      freezes the layout (same contract as pack_sequences).
#   2. one Arrow pass computes per-(partition, key) block summaries:
#      block length n, the fold from a ZERO carry, and the fold under
#      the s_1 = x_1 head convention.  #blocks ≤ #partitions + #keys —
#      a tiny driver collect, like packing's offsets.
#   3. the driver chains carries per key across partitions in pid
#      order: first block keeps its head-convention fold; after that
#      s_end = carry·(1-α)^n + zero-carry fold (exact algebra of the
#      linear recurrence).
#   4. a second Arrow pass over the SAME frozen layout folds each
#      block sequentially from its broadcast carry-in and emits every
#      row's smoothed value.
#
# So a key with a billion points uses every partition its range
# covers; nothing ever funnels through one task. Numerics: steps 3-4
# regroup the float recurrence (carry·decay + local instead of one
# long chain), which can differ from the strict sequential fold by a
# few ulps — callers that need cross-engine hash equality round the
# output (the `events_daily_ewma` gate snaps to the 1e-4 grid with a
# pure-IEEE floor quantizer against a DuckDB recursive CTE; `tests/test_timeseries.py` pins the two-phase
# result to the pure sequential fold at 1e-9).


def ewma_scan(df: DataFrame, key_col: str, order_col: str, val_col: str,
              alpha: float = 0.5, n_partitions: int | None = None,
              ) -> DataFrame:
    """``(key_col, order_col, val_col, ewma)`` — one row per input row;
    ``(key_col, order_col)`` must be unique. ``alpha`` in (0, 1]."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    spark = df.sparkSession
    parts = n_partitions or spark.sparkContext.defaultParallelism
    base = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.col(order_col).alias("t"),
        F.col(val_col).cast("double").alias("x"))
    ranged = (base.repartitionByRange(parts, "k", "t")
              .sortWithinPartitions("k", "t")
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint())

    one_minus = 1.0 - alpha

    def summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # streaming per-partition fold; blocks may span Arrow batches
        state: dict[str, tuple[int, float, float, int]] = {}
        pid_seen = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid_seen = int(pdf["_pid"].iloc[0])
            for k, x in zip(pdf["k"].to_numpy(), pdf["x"].to_numpy()):
                n, l0, l1, _ = state.get(k, (0, 0.0, 0.0, pid_seen))
                x = float(x)
                l0 = one_minus * l0 + alpha * x
                l1 = x if n == 0 else one_minus * l1 + alpha * x
                state[k] = (n + 1, l0, l1, pid_seen)
        rows = [(k, pid, n, l0, l1)
                for k, (n, l0, l1, pid) in state.items()]
        yield pd.DataFrame(
            rows, columns=["k", "_pid", "n", "l0_end", "l1_end"])

    summ = ranged.mapInPandas(
        summaries,
        "k string, _pid int, n long, l0_end double, l1_end double",
    ).collect()

    # chain carries per key across partitions, in pid order
    carries: dict[tuple[str, int], float | None] = {}
    by_key: dict[str, list] = {}
    for r in summ:
        by_key.setdefault(r["k"], []).append(r)
    for k, blocks in by_key.items():
        blocks.sort(key=lambda r: r["_pid"])
        carry: float | None = None  # None → block starts the key (s_1 = x_1)
        for b in blocks:
            carries[(k, b["_pid"])] = carry
            if carry is None:
                carry = b["l1_end"]
            else:
                carry = carry * (one_minus ** b["n"]) + b["l0_end"]

    bc = spark.sparkContext.broadcast(carries)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cmap = bc.value
        cur_key: str | None = None
        s = 0.0
        started = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            out = []
            for k, t, x in zip(pdf["k"].to_numpy(), pdf["t"].to_numpy(),
                               pdf["x"].to_numpy()):
                if k != cur_key:
                    cur_key, started = k, False
                    carry = cmap.get((k, pid))
                    if carry is not None:
                        s, started = carry, True
                x = float(x)
                s = (one_minus * s + alpha * x) if started else x
                started = True
                out.append((k, t, x, s))
            yield pd.DataFrame(out, columns=["k", "t", "x", "ewma"])

    t_type = dict(ranged.dtypes)["t"]
    res = ranged.mapInPandas(
        fold, f"k string, t {t_type}, x double, ewma double")
    return res.select(
        F.col("k").alias(key_col), F.col("t").alias(order_col),
        F.col("x").alias(val_col), "ewma")


# ---------------------------------------------------------------------------
# Holt's linear-trend smoothing (double exponential smoothing) as the
# same two-phase distributed scan, with a 2-vector state and a MATRIX
# carry. The recurrence
#     l_t = (1-α)·(l_{t-1} + b_{t-1}) + α·x_t
#     b_t = γ·(l_t − l_{t-1}) + (1-γ)·b_{t-1}
# is affine in the state s = (l, b): s_t = M·s_{t-1} + v·x_t. A block
# of n rows therefore composes to s_out = Mⁿ·s_in + u, where u is the
# block's fold from the zero state — the classic Blelloch-scan algebra
# for linear recurrences, which is what makes the per-partition
# summaries chainable on the driver (Mⁿ via numpy matrix_power, log n
# squarings; #blocks ≤ #partitions + #keys as in ewma_scan). Head
# convention: l_1 = x_1, b_1 = 0.


def holt_scan(df: DataFrame, key_col: str, order_col: str, val_col: str,
              alpha: float = 0.5, gamma: float = 0.5,
              n_partitions: int | None = None) -> DataFrame:
    """``(key_col, order_col, val_col, level, trend)`` — one row per
    input row; ``(key_col, order_col)`` must be unique."""
    import numpy as np

    if not 0.0 < alpha <= 1.0 or not 0.0 < gamma <= 1.0:
        raise ValueError(f"alpha/gamma must be in (0, 1], got "
                         f"{alpha}/{gamma}")
    spark = df.sparkSession
    parts = n_partitions or spark.sparkContext.defaultParallelism
    base = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.col(order_col).alias("t"),
        F.col(val_col).cast("double").alias("x"))
    ranged = (base.repartitionByRange(parts, "k", "t")
              .sortWithinPartitions("k", "t")
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint())

    om_a, om_g = 1.0 - alpha, 1.0 - gamma

    def step(level: float, trend: float, x: float) -> tuple[float, float]:
        l_new = om_a * (level + trend) + alpha * x
        b_new = gamma * (l_new - level) + om_g * trend
        return l_new, b_new

    def summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-(partition, key): n, zero-state fold, head-convention fold
        state: dict[str, tuple[int, float, float, float, float, int]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            for k, x in zip(pdf["k"].to_numpy(), pdf["x"].to_numpy()):
                n, l0, b0, l1, b1, _ = state.get(k, (0, 0.0, 0.0,
                                                     0.0, 0.0, pid))
                x = float(x)
                l0, b0 = step(l0, b0, x)
                if n == 0:
                    l1, b1 = x, 0.0
                else:
                    l1, b1 = step(l1, b1, x)
                state[k] = (n + 1, l0, b0, l1, b1, pid)
        yield pd.DataFrame(
            [(k, pid, n, l0, b0, l1, b1)
             for k, (n, l0, b0, l1, b1, pid) in state.items()],
            columns=["k", "_pid", "n", "l0", "b0", "l1", "b1"])

    summ = ranged.mapInPandas(
        summaries,
        "k string, _pid int, n long, l0 double, b0 double,"
        " l1 double, b1 double").collect()

    M = np.array([[om_a, om_a], [-gamma * alpha, 1.0 - gamma * alpha]])
    carries: dict[tuple[str, int], tuple[float, float] | None] = {}
    by_key: dict[str, list] = {}
    for r in summ:
        by_key.setdefault(r["k"], []).append(r)
    for k, blocks in by_key.items():
        blocks.sort(key=lambda r: r["_pid"])
        carry: tuple[float, float] | None = None
        for b in blocks:
            carries[(k, b["_pid"])] = carry
            if carry is None:
                carry = (b["l1"], b["b1"])
            else:
                mn = np.linalg.matrix_power(M, int(b["n"]))
                s_in = np.array([carry[0], carry[1]])
                s_out = mn @ s_in + np.array([b["l0"], b["b0"]])
                carry = (float(s_out[0]), float(s_out[1]))

    bc = spark.sparkContext.broadcast(carries)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cmap = bc.value
        cur_key: str | None = None
        lev = trd = 0.0
        started = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            out = []
            for k, t, x in zip(pdf["k"].to_numpy(), pdf["t"].to_numpy(),
                               pdf["x"].to_numpy()):
                if k != cur_key:
                    cur_key, started = k, False
                    carry = cmap.get((k, pid))
                    if carry is not None:
                        lev, trd, started = carry[0], carry[1], True
                x = float(x)
                if started:
                    lev, trd = step(lev, trd, x)
                else:
                    lev, trd, started = x, 0.0, True
                out.append((k, t, x, lev, trd))
            yield pd.DataFrame(
                out, columns=["k", "t", "x", "level", "trend"])

    t_type = dict(ranged.dtypes)["t"]
    res = ranged.mapInPandas(
        fold, f"k string, t {t_type}, x double, level double, trend double")
    return res.select(
        F.col("k").alias(key_col), F.col("t").alias(order_col),
        F.col("x").alias(val_col), "level", "trend")


# ---------------------------------------------------------------------------
# Grouped running SUM / MIN / MAX as the same two-phase scan with an
# ADDITIVE carry — the primitive behind running-total reports and
# CUSUM change-point detection. packing's range cumsum covers the
# global single-sequence case; this is the per-key variant with
# prefix-extrema, for series analytics where `Window.partitionBy(key)`
# would put each key on one reducer.


def cumsum_scan(df: DataFrame, key_col: str, order_col: str, val_col: str,
                n_partitions: int | None = None) -> DataFrame:
    """``(key_col, order_col, val_col, run_sum, run_min, run_max)`` —
    prefix sum and prefix extrema OF THE PREFIX SUMS per key;
    ``(key_col, order_col)`` must be unique. Carries are (sum, min,
    max) triples: for a block folded from zero carry, the chained
    state is sum' = sum + block_sum, min' = min(min, sum + block_min)
    (and symmetrically for max) — exact algebra of the additive scan,
    so only float reassociation (a few ulps) separates this from the
    sequential fold; gates snap to a grid as with ewma_scan."""
    spark = df.sparkSession
    parts = n_partitions or spark.sparkContext.defaultParallelism
    base = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.col(order_col).alias("t"),
        F.col(val_col).cast("double").alias("x"))
    ranged = (base.repartitionByRange(parts, "k", "t")
              .sortWithinPartitions("k", "t")
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint())

    # Both Arrow passes are numpy-vectorized per key SEGMENT (keys are
    # contiguous within a sorted partition): np.cumsum is a sequential
    # accumulate, np.minimum/maximum.accumulate are exact selections —
    # ~50x the row-loop throughput, and still within the same few-ulp
    # reassociation envelope the tests pin at 1e-9.
    import numpy as np

    def _segments(pdf: pd.DataFrame):
        keys = pdf["k"].to_numpy()
        cut = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        for lo, hi in zip(np.r_[0, cut], np.r_[cut, len(keys)]):
            yield keys[lo], lo, hi

    def summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[str, tuple[float, float, float, int]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            xs = pdf["x"].to_numpy(dtype="float64")
            for k, lo, hi in _segments(pdf):
                s, mn, mx, _ = state.get(
                    k, (0.0, float("inf"), float("-inf"), pid))
                run = s + np.cumsum(xs[lo:hi])
                state[k] = (float(run[-1]),
                            min(mn, float(run.min())),
                            max(mx, float(run.max())), pid)
        yield pd.DataFrame(
            [(k, pid, s, mn, mx) for k, (s, mn, mx, pid) in state.items()],
            columns=["k", "_pid", "bsum", "bmin", "bmax"])

    summ = ranged.mapInPandas(
        summaries,
        "k string, _pid int, bsum double, bmin double, bmax double",
    ).collect()

    carries: dict[tuple[str, int], tuple[float, float, float]] = {}
    by_key: dict[str, list] = {}
    for r in summ:
        by_key.setdefault(r["k"], []).append(r)
    for k, blocks in by_key.items():
        blocks.sort(key=lambda r: r["_pid"])
        c = (0.0, float("inf"), float("-inf"))
        for b in blocks:
            carries[(k, b["_pid"])] = c
            c = (c[0] + b["bsum"],
                 min(c[1], c[0] + b["bmin"]),
                 max(c[2], c[0] + b["bmax"]))

    bc = spark.sparkContext.broadcast(carries)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cmap = bc.value
        cur_key: str | None = None
        s = mn = mx = 0.0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            xs = pdf["x"].to_numpy(dtype="float64")
            run = np.empty(len(xs))
            rmin = np.empty(len(xs))
            rmax = np.empty(len(xs))
            for k, lo, hi in _segments(pdf):
                if k != cur_key:
                    cur_key = k
                    s, mn, mx = cmap[(k, pid)]
                seg = s + np.cumsum(xs[lo:hi])
                run[lo:hi] = seg
                rmin[lo:hi] = np.minimum(mn, np.minimum.accumulate(seg))
                rmax[lo:hi] = np.maximum(mx, np.maximum.accumulate(seg))
                s, mn, mx = float(seg[-1]), float(rmin[hi - 1]), \
                    float(rmax[hi - 1])
            yield pd.DataFrame(
                {"k": pdf["k"].to_numpy(), "t": pdf["t"].to_numpy(),
                 "x": xs, "run_sum": run, "run_min": rmin,
                 "run_max": rmax})

    t_type = dict(ranged.dtypes)["t"]
    res = ranged.mapInPandas(
        fold, f"k string, t {t_type}, x double, run_sum double,"
              " run_min double, run_max double")
    return res.select(
        F.col("k").alias(key_col), F.col("t").alias(order_col),
        F.col("x").alias(val_col), "run_sum", "run_min", "run_max")
