"""Model-based lifecycle differential for the plain-table txlog
stack: a RANDOM operation sequence over one table — append /
overwrite / merge-on-read delete / compaction / sidecar refresh /
checkpoint / log truncation / restore / vacuum — must always read
back exactly what a trivial driver-side model says the table holds,
with skipping reads agreeing with plain reads at every step.

This is the adversarial interleaving test for round 8's `meta`
commits and checkpoint registration carry: refresh/checkpoint/
truncate/restore can now occur in ANY order around data and delete
commits, and the replay semantics must stay exact. Each example runs
real Spark jobs, so example counts stay small — the value is the
SHAPE search (delete-then-restore-before-the-delete,
refresh-then-truncate-then-refresh, compact-on-empty, ...), not
volume.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.sources.mor import (
    tx_compact_deletes, tx_delete_keys, tx_has_live_deletes, tx_read_mor,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.skipping import (
    tx_read_point, tx_read_pruned, tx_refresh_stats,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.txlog import (
    tx_checkpoint, tx_expire_checkpoints, tx_read, tx_restore,
    tx_truncate_log, tx_vacuum, tx_write,
)

# Opt-in slow lane (r14): randomized multi-commit lifecycle model.
pytestmark = pytest.mark.slow


_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

# ops: ("append", base) ("overwrite", base) ("delete", key_offsets)
# ("compact",) ("refresh",) ("checkpoint",) ("truncate",) ("vacuum",)
# ("restore", version_index)
_op = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 4)),
    st.tuples(st.just("overwrite"), st.integers(0, 4)),
    st.tuples(st.just("delete"), st.lists(st.integers(0, 9), min_size=1,
                                          max_size=3, unique=True)),
    st.tuples(st.just("compact")),
    st.tuples(st.just("refresh")),
    st.tuples(st.just("checkpoint")),
    st.tuples(st.just("truncate")),
    st.tuples(st.just("vacuum")),
    st.tuples(st.just("restore"), st.integers(0, 100)),
)


def _block(base: int) -> set[int]:
    """10 keys per block, disjoint across bases."""
    return set(range(base * 10, base * 10 + 10))


@given(ops=st.lists(_op, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_random_lifecycle_matches_model(spark, tmp_path_factory, ops):
    t = str(tmp_path_factory.mktemp("life") / "t")

    def write(keys: set[int], mode: str):
        df = spark.createDataFrame([(k,) for k in sorted(keys)], "k long")
        return tx_write(df.coalesce(1), t, mode=mode)

    model: set[int] = set()
    # version id -> model state AT that commit; None = state not plain-
    # readable there (live MoR deletes at that point in history)
    history: dict[int, set[int] | None] = {}
    exists = False
    live_deletes = False
    last_cp = 0          # versions below this may be truncated away

    def record(vid: int):
        history[vid] = None if live_deletes else set(model)

    for op in ops:
        kind = op[0]
        if kind == "append":
            keys = _block(op[1])
            vid = write(keys, "overwrite" if not exists else "append")
            # append after delete keeps the delete live for OLDER rows;
            # re-inserted keys survive (Iceberg sequence semantics) —
            # model: plain union
            model |= keys
            exists = True
            record(vid)
        elif kind == "overwrite":
            keys = _block(op[1])
            vid = write(keys, "overwrite")
            model = set(keys)
            exists = True
            live_deletes = False      # overwrite supersedes deletes
            record(vid)
        elif kind == "delete":
            if not exists:
                continue
            # delete keys RELATIVE to current content (may miss)
            all_now = sorted(model)
            keys = {all_now[i % len(all_now)] for i in op[1]} \
                if all_now else set()
            if not keys:
                continue
            kdf = spark.createDataFrame([(k,) for k in sorted(keys)],
                                        "k long")
            vid = tx_delete_keys(kdf, t, ["k"])
            model -= keys
            live_deletes = True
            record(vid)
        elif kind == "compact":
            if not exists or not live_deletes:
                continue
            vid = tx_compact_deletes(spark, t)
            live_deletes = False
            record(vid)
        elif kind == "refresh":
            if not exists or live_deletes:
                continue  # refresh replays plain state
            vid = tx_refresh_stats(spark, t, stats_cols=["k"],
                                   bloom_cols=["k"])
            record(vid)
        elif kind == "checkpoint":
            if not exists or live_deletes:
                continue  # checkpoint refuses live deletes (guarded)
            last_cp = tx_checkpoint(t)
        elif kind == "truncate":
            if not exists:
                continue
            tx_truncate_log(t)
            tx_expire_checkpoints(t, keep=1)
            # versions before the checkpoint become unanswerable
            history = {v: s for v, s in history.items() if v >= last_cp}
        elif kind == "vacuum":
            if not exists:
                continue
            tx_vacuum(t, retention_sec=0.0)
        elif kind == "restore":
            answerable = [v for v, s in sorted(history.items())
                          if s is not None and v >= last_cp]
            if not exists or not answerable:
                continue
            target = answerable[op[1] % len(answerable)]
            vid = tx_restore(t, to_version=target)
            model = set(history[target])
            live_deletes = False      # restore publishes an overwrite
            record(vid)

        # --- invariant: disk == model, via every read path ---------
        if not exists:
            continue
        got = {r["k"] for r in tx_read_mor(spark, t).collect()}
        assert got == model, (op, sorted(got), sorted(model))
        assert tx_has_live_deletes(t) == live_deletes, op
        if not live_deletes:
            assert {r["k"] for r in tx_read(spark, t).collect()} == model
            if model:
                lo = min(model)
                pruned = {r["k"] for r in
                          tx_read_pruned(spark, t, "k", lo=lo,
                                         hi=lo + 9).collect()}
                assert pruned == {k for k in model if lo <= k <= lo + 9}
                point = {r["k"] for r in
                         tx_read_point(spark, t, "k", lo).collect()}
                assert point == {lo}
        else:
            with pytest.raises(ValueError, match="merge-on-read"):
                tx_read(spark, t).collect()
