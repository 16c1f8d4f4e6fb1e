"""As-of (nearest-previous) join — the point-in-time lookup classic
OLAP engines ship natively (DuckDB ``ASOF JOIN``, pandas
``merge_asof``) and Spark lacks.

Spark-first shape: a naive translation is a non-equi range join
(``l.ts >= r.ts`` + a per-row argmax), which Catalyst plans as a
broadcast nested-loop / range join whose candidate set explodes with
row counts. Instead we use the sort-merge formulation: tag both
inputs, union them, and carry each right row's payload forward with
``last(..., ignorenulls=True)`` over a (key, ts, side) window — ONE
shuffle on the join key, linear in rows, the same plan a 1000-executor
cluster wants (each key's timeline sorts locally within its
partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, on: str | list[str],
                       ts_col: str, payload_cols: list[str],
                       tolerance_us: int | None = None) -> DataFrame:
    """For every ``left`` row, attach the ``payload_cols`` of the
    LATEST ``right`` row with ``right.ts <= left.ts`` for the same key
    (backward as-of, inclusive — pandas ``merge_asof`` /
    DuckDB ``ASOF JOIN ON l.ts >= r.ts`` semantics). Unmatched left
    rows keep NULL payloads (left-outer).

    ``right`` must be unique per (key, ts) — pre-aggregate ties
    upstream (e.g. ``groupBy(key, ts).agg(max(id))``) so the match is
    deterministic; with intra-right ties the window's pick would be
    partition-layout-dependent.

    ``tolerance_us``: if set, matches older than this many microseconds
    are nulled out (merge_asof's ``tolerance``), evaluated AFTER the
    carry-forward so it stays one window pass.

    Skew: the (key) window serializes each key's timeline in one task
    — fine when keys are plentiful (user ids), a bottleneck if one key
    holds a visible fraction of rows. For that regime use
    ``asof_join_backward_bucketed`` (identical semantics, per-task
    work capped at one time bucket); ``operators.skew.heavy_hitters``
    tells you which regime you're in.

    Works for TIMESTAMP and TIMESTAMP_NTZ ``ts_col`` alike (ordering
    and timestamp_diff are type-agnostic)."""
    keys = [on] if isinstance(on, str) else list(on)
    reserved = {"_ts", "_side", "_match_ts", f"{ts_col}_matched"}
    clashes = sorted(
        (set(payload_cols) & set(left.columns))
        | (reserved & set(left.columns)) | (reserved & set(payload_cols)))
    if clashes:
        raise ValueError(
            f"asof_join_backward: column name collision on {clashes}; "
            f"payload_cols must be disjoint from left's columns, and "
            f"neither side may use the reserved names {sorted(reserved)} "
            f"— rename before joining")
    left_cols = [c for c in left.columns if c not in keys]
    l_tag = left.select(
        *keys, F.col(ts_col).alias("_ts"), F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols if c != ts_col],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in payload_cols],
    )
    r_tag = right.select(
        *keys, F.col(ts_col).alias("_ts"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c != ts_col],
        *[F.col(c) for c in payload_cols],
    )
    # Right rows sort BEFORE left rows at equal ts (side 0 < 1), which
    # is exactly the inclusive bound: a left row sees a same-instant
    # right row as already carried forward.
    w = Window.partitionBy(*keys).orderBy("_ts", "_side") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried: list[Column] = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols]
    match_ts = F.last(F.when(F.col("_side") == 0, F.col("_ts")),
                      ignorenulls=True).over(w)
    filled = (
        l_tag.unionByName(r_tag)
        .select(*keys, "_ts", "_side",
                *[c for c in left_cols if c != ts_col],
                *carried, match_ts.alias("_match_ts"))
        .filter(F.col("_side") == 1)
    )
    if tolerance_us is not None:
        too_old = (F.timestamp_diff("MICROSECOND", F.col("_match_ts"),
                                    F.col("_ts")) > F.lit(tolerance_us))
        filled = filled.select(
            *keys, "_ts", "_side",
            *[c for c in left_cols if c != ts_col],
            *[F.when(too_old, F.lit(None)).otherwise(F.col(c)).alias(c)
              for c in payload_cols],
            F.when(too_old, F.lit(None)).otherwise(F.col("_match_ts"))
            .alias("_match_ts"),
        )
    return (filled
            .withColumnRenamed("_ts", ts_col)
            .withColumnRenamed("_match_ts", f"{ts_col}_matched")
            .drop("_side"))


def asof_join_backward_bucketed(
        left: DataFrame, right: DataFrame, on: str | list[str],
        ts_col: str, payload_cols: list[str],
        bucket: str = "1 hour",
        tolerance_us: int | None = None) -> DataFrame:
    """Skew-hardened as-of join: identical semantics to
    ``asof_join_backward``, but the carry-forward window partitions by
    (key, time-bucket) instead of (key), so one hot key no longer
    serializes its whole timeline through a single task.

    Why the plain shape can die at scale: the (key) window sorts and
    scans each key's rows in ONE task. If a key holds 1% of a 100 TB
    event stream, that task carries ~1 TB. Bucketing splits the
    timeline into ``bucket``-sized slices (processed in parallel) and
    stitches them with a second, bucket-grain pass:

    1. per (key, bucket): the base union/last(ignorenulls) window —
       rows whose nearest-previous right row is inside their own
       bucket are final after this pass;
    2. per (key, bucket): the LAST right payload of the bucket
       (max_by on ts — an aggregate, not a window);
    3. a (key)-grain window over the DISTINCT bucket spine carries
       those bucket-last payloads strictly forward (rowsBetween
       unbounded, -1): per-key work is now O(#buckets), not O(#rows);
    4. left rows unmatched within their bucket take the carry-in via
       an equi-join on (key, bucket).

    Pick ``bucket`` so a hot key's densest bucket fits a task
    comfortably (e.g. "15 minutes" for web events); detect hot keys
    beforehand with ``operators.skew.heavy_hitters`` if unsure.
    ``bucket`` accepts any INTERVAL literal string.
    """
    keys = [on] if isinstance(on, str) else list(on)
    bkt = F.window(F.col(ts_col), bucket).start.alias("_bkt")
    l_b = left.withColumn("_bkt", bkt)
    r_b = right.withColumn("_bkt", bkt)

    # Pass 1: intra-bucket as-of (the base operator, keyed by
    # (key, bucket)). Reuses all of its tagging/tolerance machinery —
    # tolerance is deferred to the end so carry-ins are also clipped.
    intra = asof_join_backward(l_b, r_b, keys + ["_bkt"], ts_col,
                               payload_cols)

    # Pass 2: last right payload per (key, bucket).
    last_in_bucket = (
        r_b.groupBy(*keys, "_bkt")
        .agg(F.max(ts_col).alias("_last_ts"),
             *[F.max_by(c, F.col(ts_col)).alias(f"_lb_{c}")
               for c in payload_cols])
    )

    # Pass 3: bucket spine = every (key, bucket) either side touches;
    # strict-predecessor carry-forward at bucket grain. Window size
    # per key = number of buckets, independent of row skew.
    spine = (l_b.select(*keys, "_bkt").distinct()
             .unionByName(last_in_bucket.select(*keys, "_bkt"))
             .distinct())
    wb = (Window.partitionBy(*keys).orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = (
        spine.join(last_in_bucket, keys + ["_bkt"], "left")
        .select(*keys, "_bkt",
                F.last("_last_ts", ignorenulls=True).over(wb)
                .alias("_ci_ts"),
                *[F.last(f"_lb_{c}", ignorenulls=True).over(wb)
                  .alias(f"_ci_{c}") for c in payload_cols])
    )

    # Pass 4: fill the gaps. A row matched intra-bucket keeps its
    # payload (the intra match is always >= any earlier bucket's).
    matched_col = f"{ts_col}_matched"
    joined = intra.join(carry, keys + ["_bkt"], "left")
    filled = joined.select(
        *keys,
        *[c for c in intra.columns
          if c not in keys + ["_bkt", matched_col] + payload_cols],
        *[F.coalesce(F.col(c), F.col(f"_ci_{c}")).alias(c)
          for c in payload_cols],
        F.coalesce(F.col(matched_col), F.col("_ci_ts")).alias(matched_col),
    )
    if tolerance_us is not None:
        too_old = (F.timestamp_diff("MICROSECOND", F.col(matched_col),
                                    F.col(ts_col)) > F.lit(tolerance_us))
        filled = filled.select(
            *[c for c in filled.columns
              if c not in payload_cols + [matched_col]],
            *[F.when(too_old, F.lit(None)).otherwise(F.col(c)).alias(c)
              for c in payload_cols],
            F.when(too_old, F.lit(None)).otherwise(F.col(matched_col))
            .alias(matched_col),
        )
    return filled.select(*left.columns,
                         *payload_cols, matched_col)
