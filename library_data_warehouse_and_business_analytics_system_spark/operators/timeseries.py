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
