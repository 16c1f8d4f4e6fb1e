"""Weighted sampling without replacement: priority sampling
(Duffield, Lund & Thorup 2007).

Each row gets priority ``u / w`` where ``u`` is a deterministic
md5-derived uniform in [0, 1) and ``w`` the row's weight; the k
smallest priorities form a weighted sample without replacement.
This is the hash-seeded flavor of the exponential-keys method
(Efraimidis & Spirakis use ``u^(1/w)``; the ``u/w`` priority form
needs no ``pow``, which matters here because transcendental
functions are NOT bit-identical across engines — see
operators/search.py — while one double division is).

Scale: entirely map-side until the global top-k (a k-row
TakeOrdered); no shuffle proportional to the data. Deterministic by
construction — same salt, same sample, on any cluster layout, and
bit-reproducible by any engine that can md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import md5_unit_interval


def priority_sample(df: DataFrame, weight: Column, k: int,
                    id_col: str, salt: str = "ps:") -> DataFrame:
    """The k rows with smallest ``u / w`` priority — a weighted
    sample without replacement (heavier rows draw smaller
    priorities). Ties (impossible unless ids collide in md5) break
    on the id. Adds ``priority`` and ``sample_rank`` columns.

    The top-k goes through ``orderBy(...).limit(k)`` — Spark plans
    TakeOrderedAndProject (per-partition top-k, k-row driver merge),
    the W4 shape — and only the k survivors see the rank window, so
    nothing data-proportional ever lands on one reducer."""
    keyed = df.withColumn(
        "priority",
        md5_unit_interval(F.col(id_col).cast("string"), salt)
        / weight.cast("double"))
    top = keyed.orderBy(F.col("priority").asc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("priority").asc(), F.col(id_col))
    return top.withColumn("sample_rank", F.row_number().over(w))
