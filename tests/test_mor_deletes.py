"""Merge-on-read equality deletes (sources/mor.py): Iceberg
format-v2 delete-file semantics on the txlog — deletes stage O(keys)
bytes, apply only to OLDER data commits, and compact away into one
copy-on-write commit."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.sources.mor import (
    tx_compact_deletes, tx_delete_keys, tx_delete_where, tx_read_mor,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.txlog import (
    tx_checkpoint, tx_read, tx_vacuum, tx_write,
)


def _rows(spark, data, cols=("k", "v")):
    return spark.createDataFrame(data, list(cols))


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _file_bytes(table: str) -> dict[str, int]:
    return {str(p): p.stat().st_size
            for p in Path(table, "data").rglob("*.parquet")}


def test_delete_applies_only_to_older_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_rows(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    tx_delete_keys(_rows(spark, [(2, "b")]).select("k"), t, ["k"])
    # rows re-inserted AFTER the delete survive it (sequence-number
    # semantics — the thing a naive global anti-join gets wrong)
    tx_write(_rows(spark, [(2, "b2"), (4, "d")]), t)
    assert _collect(tx_read_mor(spark, t)) == [
        (1, "a"), (2, "b2"), (3, "c"), (4, "d")]


def test_delete_rewrites_nothing(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_rows(spark, [(i, "x") for i in range(100)]), t)
    before = _file_bytes(t)
    tx_delete_keys(_rows(spark, [(7, "x")]).select("k"), t, ["k"])
    after = _file_bytes(t)
    # every pre-existing parquet byte-identical; only the tiny key
    # sidecar is new
    assert all(after[p] == sz for p, sz in before.items())
    assert len(after) > len(before)
    assert (7, "x") not in _collect(tx_read_mor(spark, t))


def test_deletes_accumulate_and_stack(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_rows(spark, [(1, "a"), (2, "b")]), t)
    tx_delete_keys(_rows(spark, [(1, "a")]).select("k"), t, ["k"])
    tx_write(_rows(spark, [(3, "c")]), t)
    tx_delete_keys(_rows(spark, [(3, "c")]).select("k"), t, ["k"])
    assert _collect(tx_read_mor(spark, t)) == [(2, "b")]


def test_plain_read_and_checkpoint_raise_on_live_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_rows(spark, [(1, "a")]), t)
    tx_delete_keys(_rows(spark, [(1, "a")]).select("k"), t, ["k"])
    with pytest.raises(ValueError, match="merge-on-read"):
        tx_read(spark, t).collect()
    with pytest.raises(ValueError, match="merge-on-read"):
        tx_checkpoint(t)


def test_compact_restores_plain_reads_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_rows(spark, [(1, "a"), (2, "b")]), t)
    d = tx_delete_keys(_rows(spark, [(1, "a")]).select("k"), t, ["k"])
    mor = _collect(tx_read_mor(spark, t))
    tx_compact_deletes(spark, t)
    # plain read works again and equals the MoR view
    assert _collect(tx_read(spark, t)) == mor == [(2, "b")]
    tx_checkpoint(t)
    # MoR time travel into the pre-compaction history still works
    assert _collect(tx_read_mor(spark, t, as_of=d)) == [(2, "b")]
    assert _collect(tx_read_mor(spark, t, as_of=d - 1)) == [
        (1, "a"), (2, "b")]


def test_delete_where_scans_current_snapshot(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_rows(spark, [(1, "keep"), (2, "drop"), (3, "drop")]), t)
    tx_delete_where(spark, t, F.col("v") == "drop", ["k"])
    assert _collect(tx_read_mor(spark, t)) == [(1, "keep")]


def test_delete_txn_id_idempotent(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_rows(spark, [(1, "a"), (2, "b")]), t)
    a = tx_delete_keys(_rows(spark, [(1, "a")]).select("k"), t, ["k"],
                       txn_id="del-1")
    b = tx_delete_keys(_rows(spark, [(1, "a")]).select("k"), t, ["k"],
                       txn_id="del-1")
    assert a == b
    assert _collect(tx_read_mor(spark, t)) == [(2, "b")]


def test_overwrite_resets_delete_era(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_rows(spark, [(1, "a")]), t)
    tx_delete_keys(_rows(spark, [(1, "a")]).select("k"), t, ["k"])
    tx_write(_rows(spark, [(1, "fresh")]), t, mode="overwrite")
    # the old delete must not shadow the re-created key
    assert _collect(tx_read_mor(spark, t)) == [(1, "fresh")]


def test_vacuum_keeps_delete_sidecars(spark, tmp_path):
    """Delete sidecars are LOGGED dirs — vacuum must keep them while
    the log references them (MoR time travel needs them)."""
    t = str(tmp_path / "t")
    tx_write(_rows(spark, [(1, "a"), (2, "b")]), t)
    tx_delete_keys(_rows(spark, [(1, "a")]).select("k"), t, ["k"])
    removed = tx_vacuum(t, retention_sec=0)
    assert removed == []
    assert _collect(tx_read_mor(spark, t)) == [(2, "b")]
