"""maintain_warehouse composition (VERDICT r7 item 4): a warehouse
that took cheap merge-on-read deletes must come out of maintenance
readable again (deletes compacted), and skipping sidecars must
survive OPTIMIZE + checkpoint + log truncation (stats re-harvested,
bloom sidecars rebuilt, registrations carried by the checkpoint)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.plans.library.durable import (
    DIMS, FACT_KEYS, YEAR_KEY, maintain_warehouse,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.mor import (
    tx_delete_keys, tx_has_live_deletes, tx_read_mor,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.skipping import (
    tx_read_parts_pruned, tx_read_point, tx_read_pruned, tx_refresh_stats,
    tx_write_stats,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.txlog import (
    tx_checkpoint, tx_read, tx_read_parts, tx_truncate_log, tx_write,
    tx_write_parts,
)


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _mini_warehouse(spark, root: str) -> None:
    """Tiny but complete warehouse layout: every DIMS table plain,
    every FACT_KEYS table year-partitioned (what maintain_warehouse
    iterates over)."""
    for name in DIMS:
        df = spark.range(20).select(
            F.col("id").alias("key"),
            F.concat(F.lit(f"{name}-"), F.col("id")).alias("val"))
        tx_write(df, f"{root}/{name}", mode="overwrite")
    for name in FACT_KEYS:
        # fk ranges align with years (25 per year) so per-dir footer
        # stats on fk are selective after the per-partition rewrite
        df = spark.range(100).select(
            F.col("id").alias("fk"),
            (F.floor(F.col("id") / 25) + 2020).cast("string")
            .alias(YEAR_KEY),
            (F.col("id") * 3 % 97).cast("double").alias("amt"))
        tx_write_parts(df, f"{root}/{name}", YEAR_KEY, mode="overwrite")


def test_maintain_compacts_live_mor_deletes(spark, tmp_path):
    """Warehouse with MoR deletes on a dim: plain reads refuse before
    maintenance, work after, and the surviving snapshot is row-
    identical to the merge-on-read view taken before compaction."""
    root = str(tmp_path / "wh")
    _mini_warehouse(spark, root)
    dim = f"{root}/dim_members"
    keys = spark.createDataFrame([(3,), (7,), (11,)], "key long")
    tx_delete_keys(keys, dim, ["key"])

    assert tx_has_live_deletes(dim)
    with pytest.raises(ValueError, match="merge-on-read"):
        tx_read(spark, dim).collect()
    before = _collect(tx_read_mor(spark, dim))
    assert len(before) == 17

    maintain_warehouse(spark, root)

    assert not tx_has_live_deletes(dim)
    after = _collect(tx_read(spark, dim))      # plain read works again
    assert after == before                      # snapshot rows identical
    # facts (partitioned — no MoR path) passed through maintenance too
    assert tx_read_parts(spark, f"{root}/fact_sales").count() == 100


def test_maintain_refreshes_parts_stats_after_optimize(spark, tmp_path):
    """OPTIMIZE rewrites every partition dir (fresh dirs, no stats);
    with stats= the maintenance pass re-harvests footer min/max and
    the checkpoint carries them past log truncation — a range read
    after maintenance still opens only the overlapping dirs."""
    root = str(tmp_path / "wh")
    _mini_warehouse(spark, root)
    fact = f"{root}/fact_sales"
    plain_before = _collect(tx_read_parts(spark, fact).drop(YEAR_KEY))

    maintain_warehouse(
        spark, root,
        zorder={"fact_sales": ["fk", "amt"]},
        stats={"fact_sales": ["fk"]})

    # data byte-for-row identical through optimize + refresh
    assert _collect(tx_read_parts(spark, fact).drop(YEAR_KEY)) \
        == plain_before
    # the log was truncated: only checkpoint-carried stats can prune
    assert json.loads(
        sorted(Path(fact, "_txlog", "checkpoints").glob("*.json"))[-1]
        .read_text()).get("dirstats")
    seen: list[str] = []
    real_parquet = type(spark.read).parquet

    def spy(reader, *paths):
        seen.extend(paths)
        return real_parquet(reader, *paths)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(type(spark.read), "parquet", spy)
        got = _collect(tx_read_parts_pruned(spark, fact, "fk",
                                            lo=0, hi=10).drop(YEAR_KEY))
    # fk 0..10 live in a zkey-contiguous subset of the optimized dirs
    n_dirs = len({d for ds in _visible(fact).values() for d in ds})
    assert len(seen) < n_dirs, (len(seen), n_dirs)
    assert got == [t for t in plain_before if 0 <= t[0] <= 10]


def _visible(table):
    from library_data_warehouse_and_business_analytics_system_spark.sources.txlog import (
        _visible_parts,
    )
    return _visible_parts(table)


def test_refresh_builds_bloom_and_checkpoint_carries_it(spark, tmp_path):
    """Plain table written WITHOUT blooms: tx_refresh_stats builds the
    missing sidecars; after checkpoint + truncation (which strips the
    write-path entries) point reads still prune via the checkpoint's
    carried registrations."""
    t = str(tmp_path / "t")
    for base in (0, 1000, 2000, 3000):
        df = spark.range(base, base + 100).select(F.col("id").alias("k"))
        tx_write(df, t, mode="append")

    tx_refresh_stats(spark, t, stats_cols=["k"], bloom_cols=["k"])
    tx_checkpoint(t)
    tx_truncate_log(t)

    seen: list[str] = []
    real_parquet = type(spark.read).parquet

    def spy(reader, *paths):
        seen.extend(paths)
        return real_parquet(reader, *paths)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(type(spark.read), "parquet", spy)
        hit = _collect(tx_read_point(spark, t, "k", 2042))
        n_after_hit = len(seen)
        rng = _collect(tx_read_pruned(spark, t, "k", lo=1000, hi=1099))
    assert hit == [(2042,)]
    assert n_after_hit == 1                 # bloom pruned 3 of 4 dirs
    assert len(seen) - n_after_hit == 1     # stats pruned 3 of 4 dirs
    assert rng == [(k,) for k in range(1000, 1100)]


def test_checkpoint_carries_write_path_stats_past_truncation(spark,
                                                             tmp_path):
    """Regression for the documented degradation: stats recorded at
    write time used to die with tx_truncate_log. The checkpoint now
    folds live dirs' stats into its payload, so pruning survives a
    maintenance pass with NO refresh call at all."""
    t = str(tmp_path / "t")
    for y in (1995, 1996, 1997, 1998):
        df = spark.range(10).select(
            (F.col("id") + y * 10000).alias("k"), F.lit(y).alias("yr"))
        tx_write_stats(df, t, ["yr"])
    tx_checkpoint(t)
    tx_truncate_log(t)
    assert list(Path(t, "_txlog").glob("*.json")) == []   # log gone

    seen: list[str] = []
    real_parquet = type(spark.read).parquet

    def spy(reader, *paths):
        seen.extend(paths)
        return real_parquet(reader, *paths)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(type(spark.read), "parquet", spy)
        got = _collect(tx_read_pruned(spark, t, "yr", lo=1996, hi=1997))
    assert len(seen) == 2
    assert len(got) == 20


def test_meta_commit_is_replay_neutral(spark, tmp_path):
    """A meta (refresh) commit must not disturb snapshot semantics:
    reads, time travel to pre-meta commits, and a later overwrite all
    behave exactly as without it."""
    t = str(tmp_path / "t")
    df1 = spark.range(5).select(F.col("id").alias("k"))
    tx_write(df1, t, mode="overwrite")                      # commit 1
    cid = tx_refresh_stats(spark, t, stats_cols=["k"])      # commit 2
    assert cid == 2
    assert tx_read(spark, t).count() == 5
    assert tx_read(spark, t, as_of=1).count() == 5
    df2 = spark.range(3).select(F.col("id").alias("k"))
    tx_write(df2, t, mode="overwrite")                      # commit 3
    assert tx_read(spark, t).count() == 3
    assert tx_read(spark, t, as_of=2).count() == 5
    # nothing to register → no commit published
    empty = str(tmp_path / "t2")
    tx_write(df1, empty, mode="overwrite")
    assert tx_refresh_stats(spark, empty) == 1


def test_refresh_registrations_survive_restore_and_vacuum(spark, tmp_path):
    """Data dirs are immutable, so a dir's stats/bloom registration
    stays valid through RESTORE (old dirs coming back are still the
    bytes the registration described) and through vacuum (reclaimed
    dirs simply never appear in a replay, so their stale registrations
    are never consulted)."""
    from library_data_warehouse_and_business_analytics_system_spark.sources.txlog import (
        tx_restore, tx_vacuum,
    )

    t = str(tmp_path / "t")
    for base in (0, 1000):
        df = spark.range(base, base + 50).select(F.col("id").alias("k"))
        tx_write(df, t, mode="append")                    # commits 1, 2
    tx_refresh_stats(spark, t, stats_cols=["k"], bloom_cols=["k"])  # 3
    df3 = spark.range(2000, 2050).select(F.col("id").alias("k"))
    tx_write(df3, t, mode="overwrite")                    # commit 4
    tx_restore(t, to_version=3)                           # commit 5: back

    # restored dirs prune exactly as they did pre-overwrite
    seen: list[str] = []
    real_parquet = type(spark.read).parquet

    def spy(reader, *paths):
        seen.extend(paths)
        return real_parquet(reader, *paths)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(type(spark.read), "parquet", spy)
        got = _collect(tx_read_pruned(spark, t, "k", lo=1000, hi=1049))
        n_range = len(seen)
        hit = _collect(tx_read_point(spark, t, "k", 7))
    assert got == [(k,) for k in range(1000, 1050)]
    assert n_range == 1                       # stats pruned 1 of 2 dirs
    assert hit == [(7,)]
    assert len(seen) - n_range == 1           # bloom pruned 1 of 2 dirs

    # vacuum with zero retention: the overwritten commit-4 dir is still
    # log-referenced (never reclaimed), snapshot unchanged
    tx_vacuum(t, retention_sec=0.0)
    assert tx_read(spark, t).count() == 100
