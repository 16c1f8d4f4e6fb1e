"""As-of join operator semantics (operators/asof.py): backward
inclusive match, left-outer NULLs, tolerance nulling, and the
one-shuffle plan shape. The registry query `events_asof_purchase_view`
additionally differentials the operator against DuckDB's native
ASOF JOIN in tests/test_correctness.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.asof import (
    asof_join_backward,
)


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L10"), (1, _ts(20), "L20"), (1, _ts(5), "L5"),
         (2, _ts(30), "L30")],
        "k long, ts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, _ts(10), "R10"), (1, _ts(15), "R15"), (2, _ts(40), "R40")],
        "k long, ts timestamp, rval string")
    return left, right


def test_backward_inclusive_and_unmatched(spark):
    left, right = _frames(spark)
    out = {r.lval: (r.rval, r.ts_matched)
           for r in asof_join_backward(left, right, "k", "ts",
                                       ["rval"]).collect()}
    assert out["L10"] == ("R10", _ts(10))   # same instant matches (inclusive)
    assert out["L20"] == ("R15", _ts(15))   # latest prior, not just any prior
    assert out["L5"] == (None, None)        # nothing before -> left-outer NULL
    assert out["L30"] == (None, None)       # right row is in the future


def test_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {r.lval: r.rval
           for r in asof_join_backward(left, right, "k", "ts", ["rval"],
                                       tolerance_us=3_000_000).collect()}
    assert out["L10"] == "R10"              # gap 0 <= 3s
    assert out["L20"] is None               # gap 5s > 3s -> nulled


def test_single_shuffle_no_range_join(spark):
    """The plan must be the sort-merge/carry-forward shape: exactly one
    Exchange on the join key, no cartesian/nested-loop stage — the
    property that keeps as-of linear at 100 TB where a non-equi range
    join explodes."""
    left, right = _frames(spark)
    plan = asof_join_backward(left, right, "k", "ts", ["rval"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_multi_key_and_ntz(spark):
    """Composite keys and TIMESTAMP_NTZ inputs (the driver's parquet
    type) both work."""
    left = spark.createDataFrame(
        [(1, "a", _ts(10)), (1, "b", _ts(10))],
        "k long, g string, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(1, "a", _ts(7), 99.0)],
        "k long, g string, ts timestamp_ntz, price double")
    rows = {(r.k, r.g): r.price
            for r in asof_join_backward(left, right, ["k", "g"], "ts",
                                        ["price"]).collect()}
    assert rows[(1, "a")] == 99.0
    assert rows[(1, "b")] is None
