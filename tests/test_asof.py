"""As-of join operator semantics (operators/asof.py): backward
inclusive match, left-outer NULLs, tolerance nulling, and the
one-shuffle plan shape. The registry query `events_asof_purchase_view`
additionally differentials the operator against DuckDB's native
ASOF JOIN in tests/test_correctness.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.asof import (
    asof_join_backward, asof_join_backward_bucketed,
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


# ---------------------------------------------------------------------------
# Skew-hardened bucketed variant: must be semantically identical to the
# plain operator on any input; its windows must partition by
# (key, bucket) so a hot key's timeline never serializes in one task.


def test_bucketed_matches_plain_randomized(spark):
    """Randomized differential: bucketed vs plain as-of on seeded data
    with a deliberately hot key (80% of rows), cross-bucket matches
    (sparse right side), ties at bucket edges, and NULL-gap leads."""
    import random
    rng = random.Random(13)
    _ts0 = dt.datetime(2024, 1, 1)
    lrows, rrows = [], []
    for i in range(400):
        k = 1 if rng.random() < 0.8 else rng.randrange(2, 6)
        s = rng.randrange(0, 3600)
        lrows.append((k, _ts0 + dt.timedelta(seconds=s), f"L{i}"))
    for i in range(60):
        k = 1 if rng.random() < 0.8 else rng.randrange(2, 6)
        s = rng.randrange(0, 3600)
        rrows.append((k, _ts0 + dt.timedelta(seconds=s), f"R{i}"))
    # right must be unique per (k, ts): dedup ties deterministically
    seen = {}
    for k, ts, v in rrows:
        seen[(k, ts)] = v
    rrows = [(k, ts, v) for (k, ts), v in seen.items()]
    left = spark.createDataFrame(lrows, "k long, ts timestamp, lval string")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, rval string")
    for tol in (None, 120_000_000):
        plain = {(r.k, r.ts, r.lval): (r.rval, r.ts_matched)
                 for r in asof_join_backward(
                     left, right, "k", "ts", ["rval"],
                     tolerance_us=tol).collect()}
        bucketed = {(r.k, r.ts, r.lval): (r.rval, r.ts_matched)
                    for r in asof_join_backward_bucketed(
                        left, right, "k", "ts", ["rval"],
                        bucket="5 minutes", tolerance_us=tol).collect()}
        assert bucketed == plain, f"tolerance={tol}"


def test_bucketed_small_case_cross_bucket_carry(spark):
    left, right = _frames(spark)
    out = {r.lval: (r.rval, r.ts_matched)
           for r in asof_join_backward_bucketed(
               left, right, "k", "ts", ["rval"],
               bucket="7 seconds").collect()}
    # L20 (bucket [14,21)) matches R15 intra-bucket; L10 matches R10
    # exactly at its own instant; L5 has no predecessor at all.
    assert out["L10"] == ("R10", _ts(10))
    assert out["L20"] == ("R15", _ts(15))
    assert out["L5"] == (None, None)
    assert out["L30"] == (None, None)


def test_bucketed_windows_partition_by_bucket(spark):
    """Every window in the bucketed plan must include the bucket in its
    partition spec except the bucket-spine stitch (whose row count is
    #buckets, not #rows) — the property that caps per-key task size."""
    left, right = _frames(spark)
    plan = asof_join_backward_bucketed(left, right, "k", "ts", ["rval"],
                                       bucket="7 seconds") \
        ._jdf.queryExecution().executedPlan().toString()
    # a Window node line ends "... AS x#n], [partitionSpec], [orderSpec]"
    partition_specs = [
        line.rsplit("], [", 2)[1]
        for line in plan.splitlines() if "Window [" in line]
    assert partition_specs, plan
    row_grain = [p for p in partition_specs if "_bkt" in p]
    spine_grain = [p for p in partition_specs if "_bkt" not in p]
    assert row_grain, "expected (key, bucket)-partitioned windows"
    # the only key-grain window is the bucket-spine carry pass
    assert len(spine_grain) <= 1, plan


def test_gapfill_interpolate_known_values(spark):
    """Known series: holes take the linear interpolation between the
    nearest observations; edges extrapolate flat; dense rows pass
    through; result is partitioning-independent."""
    import datetime as dt

    from library_data_warehouse_and_business_analytics_system_spark.operators.timeseries import (
        gapfill_interpolate,
    )

    d = dt.date
    rows = [
        # user 1: 10 .. hole .. hole .. 40  -> 20, 30 interpolated
        (1, d(2024, 1, 1), 10.0), (1, d(2024, 1, 4), 40.0),
        # user 2: leading edge hole impossible (spine starts at first
        # obs); single point -> single dense row
        (2, d(2024, 2, 1), 5.0),
        # user 3: uneven gap: 0 .. hole .. 3 -> 1.5 at the midpoint? no:
        # 3-day span, hole at day 2 of [1..3]: 0 + 3 * (1/2) = 1.5
        (3, d(2024, 3, 1), 0.0), (3, d(2024, 3, 3), 3.0),
    ]
    df = spark.createDataFrame(rows, "k long, d date, v double")

    def run(frame):
        out = gapfill_interpolate(frame, "k", "d", "v").collect()
        return {(r.k, str(r.d)): (r.v_filled, r.was_gap) for r in out}

    got = run(df)
    assert got[(1, "2024-01-01")] == (10.0, False)
    assert got[(1, "2024-01-02")] == (20.0, True)
    assert got[(1, "2024-01-03")] == (30.0, True)
    assert got[(1, "2024-01-04")] == (40.0, False)
    assert got[(2, "2024-02-01")] == (5.0, False)
    assert got[(3, "2024-03-02")] == (1.5, True)
    assert len(got) == 4 + 1 + 3
    assert got == run(df.repartition(7))
