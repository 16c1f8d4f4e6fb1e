"""File-level column statistics + data skipping for txlog tables —
Delta's per-file min/max stats, at commit-dir granularity.

Partitioned tables already prune at metadata level by partition
value (``tx_read_parts(part_values=...)``). This module gives
UNPARTITIONED tables the same property for any column with a natural
write-time clustering (ingest date, monotone ids): the commit entry
carries per-dir ``{col: [min, max]}`` harvested from the PARQUET
FOOTERS of the staged files — a metadata-only pass, no second scan
of the data — and a pruned read lists only the dirs whose range
intersects the predicate.

Scale: a 100 TB fact appended daily for 3 years is ~1000 commit
dirs; a "last 7 days" query must open 7, not 1000. Parquet's own
row-group stats then prune WITHIN the opened dirs (Spark does that
automatically); this layer prunes the DIR LIST before any file is
opened — the part Spark cannot do for a multi-dir snapshot.

Honesty notes:
- Stats survive in the LOG ENTRIES; a checkpoint summarizes dirs
  only, so after ``tx_truncate_log`` pruning degrades to reading all
  checkpointed dirs (still CORRECT — dirs without known stats are
  never skipped). Re-appending through maintenance restores stats.
- Only int/float/str/date/timestamp columns carry stats (what
  parquet footers expose losslessly); others are ignored.
"""

from __future__ import annotations

import datetime as _dt
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession

from .txlog import _DATA, _entries, _latest_checkpoint, _publish, _replay

_TYPES = (int, float, str)


def _encode(v):
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, _TYPES):
        return v
    if isinstance(v, _dt.datetime):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"t": "d", "v": v.isoformat()}
    if isinstance(v, bytes):
        return None              # truncation-unsafe in footers
    return None


def _decode(v):
    if isinstance(v, dict):
        if v["t"] == "d":
            return _dt.date.fromisoformat(v["v"])
        return _dt.datetime.fromisoformat(v["v"])
    return v


def _footer_stats(stage_dir: Path, cols: list[str]) -> dict:
    """Min/max per requested column across every row group of every
    staged file, straight from the parquet footers. A column missing
    exact stats in ANY row group is dropped entirely (a partial range
    would wrongly prune)."""
    import pyarrow.parquet as pq

    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    dead: set[str] = set()
    want = set(cols)
    for f in sorted(stage_dir.rglob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                c = g.column(i)
                name = c.path_in_schema
                if name not in want or name in dead:
                    continue
                st = c.statistics
                if (st is None or not st.has_min_max
                        or st.min is None or st.max is None):
                    dead.add(name)
                    continue
                lo, hi = st.min, st.max
                if name not in mins or lo < mins[name]:
                    mins[name] = lo
                if name not in maxs or hi > maxs[name]:
                    maxs[name] = hi
    out = {}
    for name in want - dead:
        if name in mins:
            lo, hi = _encode(mins[name]), _encode(maxs[name])
            if lo is not None and hi is not None:
                out[name] = [lo, hi]
    return out


def tx_write_stats(df: DataFrame, table: str, stats_cols: list[str],
                   mode: str = "append", max_retries: int = 10,
                   txn_id: str | None = None,
                   expect_latest: int | None = None) -> int:
    """``tx_write`` that additionally records per-commit min/max for
    ``stats_cols``, harvested from the staged parquet footers
    (metadata-only — the data is not re-scanned)."""
    import uuid as _uuid

    if mode not in ("append", "overwrite"):
        raise ValueError(f"tx_write_stats: unknown mode {mode!r}")
    if txn_id is not None:
        for e in _entries(table):
            if e.get("txn") == txn_id:
                return e["id"]
    stage = f"{_DATA}/{_uuid.uuid4().hex}"
    df.write.parquet(str(Path(table) / stage))
    stats = _footer_stats(Path(table) / stage, stats_cols)
    payload = {"mode": mode, "dir": stage}
    if stats:
        payload["stats"] = stats
    return _publish(table, payload, max_retries, txn_id, expect_latest)


def _dir_stats(table: str) -> dict[str, dict]:
    """dir → stats map from the surviving log entries (checkpointed
    history has no stats — those dirs simply never prune)."""
    out: dict[str, dict] = {}
    for e in _entries(table):
        if "stats" in e and "dir" in e:
            out[e["dir"]] = e["stats"]
    return out


def tx_read_pruned(spark: SparkSession, table: str, col: str,
                   lo=None, hi=None,
                   as_of: int | None = None) -> DataFrame:
    """Snapshot read of rows with ``lo <= col <= hi`` (either bound
    optional), opening ONLY the visible dirs whose recorded [min,
    max] intersects the bound — dirs without stats are always read
    (never wrongly skipped). The residual per-row filter is applied
    on top, so the result is exactly the filtered snapshot."""
    cp = _latest_checkpoint(table, as_of)
    base = cp["id"] if cp else 0
    entries = [e for e in _entries(table) if e["id"] > base]
    dirs = _replay(cp, entries, table, as_of)
    if not dirs:
        raise FileNotFoundError(f"tx_read_pruned: no commits in {table}")
    stats = _dir_stats(table)
    keep = []
    for d in dirs:
        s = stats.get(d, {}).get(col)
        if s is None:
            keep.append(d)
            continue
        dmin, dmax = _decode(s[0]), _decode(s[1])
        if lo is not None and dmax < lo:
            continue
        if hi is not None and dmin > hi:
            continue
        keep.append(d)
    if not keep:
        # predicate excludes every dir: empty frame with the schema
        df = spark.read.parquet(*[str(Path(table) / d) for d in dirs])
        return df.where("1=0")
    df = spark.read.parquet(*[str(Path(table) / d) for d in keep])
    from pyspark.sql import functions as F
    cond: Column | None = None
    if lo is not None:
        cond = F.col(col) >= F.lit(lo)
    if hi is not None:
        c2 = F.col(col) <= F.lit(hi)
        cond = c2 if cond is None else cond & c2
    return df.where(cond) if cond is not None else df
