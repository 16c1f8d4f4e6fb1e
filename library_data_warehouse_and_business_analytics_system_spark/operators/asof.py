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
