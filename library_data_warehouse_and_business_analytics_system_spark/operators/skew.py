"""Skew-mitigation operators: heavy-hitter detection and salted joins.

AQE's runtime skew-join splitting (enabled in session.py) covers most
cases; explicit salting is for the ones it can't — e.g. a single key
holding >1/Nth of the data in an aggregation, or a skewed key on the
build side of a shuffle join. The reference never needs this (Oracle,
≤200k rows) but a 100 TB borrow/sales fact with a hot member or title
does; this module is the documented escape hatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, keys: list[str], min_share: float = 0.01,
                  sample_fraction: float | None = None) -> DataFrame:
    """Keys holding at least ``min_share`` of rows (optionally from a
    seeded sample — at 100 TB you profile the 0.1% sample, not the
    fact). Output: key columns + n_rows + share."""
    src = df.sample(fraction=sample_fraction, seed=42) if sample_fraction \
        else df
    counted = src.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counted.agg(F.sum("n_rows").alias("_t"))
    return (
        counted.crossJoin(F.broadcast(total))
        .select(*keys, "n_rows",
                (F.col("n_rows") / F.col("_t")).alias("share"))
        .filter(F.col("share") >= min_share)
    )


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: hash every column — uniform, stable
    across retries (rand() would re-evaluate differently per task
    attempt and break exactly-once semantics of retried stages)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(n_salts)).cast("int")


def salted_join(skewed: DataFrame, small: DataFrame, on: list[str],
                how: str = "inner", n_salts: int = 16) -> DataFrame:
    """Join a skewed large side to a small side with key salting.

    The skewed side gets a deterministic salt in [0, n_salts); the
    small side is replicated n_salts times. The shuffle key becomes
    (key, salt), spreading a hot key over ``n_salts`` reducers. Small
    side grows ×n_salts — keep it broadcast-sized / dimension-sized.
    """
    salted = skewed.withColumn("_salt", _salt_col(skewed, n_salts))
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = salted.join(replicated, on + ["_salt"], how)
    return out.drop("_salt")


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column],
               n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation through an explicit salt: partial agg on
    (keys, salt), final agg on keys. Only decomposable aggregates
    (SUM/COUNT/MIN/MAX) are accepted — the caller passes phase-1
    expressions and phase 2 re-applies SUM/MIN/MAX by name.

    Spark's hash aggregate already does map-side partial combine; the
    explicit variant exists for skew *after* the first shuffle (one key
    >> one reducer's memory) and as the building block for windowed
    variants.
    """
    phase1 = (
        df.withColumn("_salt", _salt_col(df, n_salts))
        .groupBy(*keys, "_salt")
        .agg(*[v.alias(k) for k, v in aggs.items()])
    )
    refold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    finals = []
    for name in aggs:
        kind = name.split("_")[0]
        if kind not in refold:
            raise ValueError(
                f"salted_agg: alias {name!r} must start with one of "
                f"{sorted(refold)} to define its refold")
        finals.append(refold[kind](name).alias(name))
    return phase1.groupBy(*keys).agg(*finals)


def count_min_sketch(df: DataFrame, col: str, depth: int = 4,
                     width: int = 1024, salt: str = "cms:") -> DataFrame:
    """Count-min sketch of ``col``'s frequencies: ``(s, bucket, cnt)``
    for ``depth`` independent md5-derived hash rows of ``width``
    buckets — depth×width integers summarizing an unbounded key
    domain. Build is one explode(depth) + a two-phase integer count
    on (row, bucket): fully mergeable across partitions/batches
    (sketches of shards ADD), deterministic (md5 buckets), and
    exactly reproducible by any engine that can md5 — which is what
    lets the driver gate check the sketch itself, not just its
    estimates."""
    from ..functions.text import md5_bucket
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("s")
    tagged = df.select(F.col(col).alias("_k"), rows)
    bucket = md5_bucket(
        F.concat(F.col("s").cast("string"), F.lit(":"),
                 F.col("_k").cast("string")), width, salt=salt)
    return (tagged.withColumn("bucket", bucket)
            .groupBy("s", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, col: str,
                 depth: int = 4, width: int = 1024,
                 salt: str = "cms:") -> DataFrame:
    """Point-estimate each key's frequency from the sketch: min over
    the depth rows of the key's bucket count (the classic CM upper
    bound — never below the true count; collisions only inflate).
    ``keys`` is small (the candidate set); its (row, bucket) probes
    broadcast against the sketch."""
    from ..functions.text import md5_bucket
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("s")
    probes = keys.select(F.col(col), rows)
    bucket = md5_bucket(
        F.concat(F.col("s").cast("string"), F.lit(":"),
                 F.col(col).cast("string")), width, salt=salt)
    probes = probes.withColumn("bucket", bucket)
    return (F.broadcast(probes).join(sketch, ["s", "bucket"], "left")
            .groupBy(col)
            .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint")
                 .alias("cms_count")))
