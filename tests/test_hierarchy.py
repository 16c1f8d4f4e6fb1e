"""CONNECT BY PRIOR traversal (operators/hierarchy.py): levels,
roots, paths, forest separation, and the cycle guard."""

from __future__ import annotations

import pytest

from library_data_warehouse_and_business_analytics_system_spark.operators.hierarchy import connect_by_prior


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, parent long, tag string")


def test_levels_roots_paths(spark):
    #   1            2
    #   ├─ 10        └─ 20
    #   │   └─ 100
    #   └─ 11
    rows = [(1, None, "r"), (2, None, "r"),
            (10, 1, "a"), (11, 1, "b"), (20, 2, "c"), (100, 10, "d")]
    out = {r["k"]: r for r in
           connect_by_prior(_df(spark, rows), "k", "parent").collect()}
    assert out[1]["lvl"] == 0 and out[1]["root"] == 1 and out[1]["path"] == "/1"
    assert out[100]["lvl"] == 2 and out[100]["root"] == 1
    assert out[100]["path"] == "/1/10/100"
    assert out[20]["root"] == 2 and out[20]["path"] == "/2/20"
    assert out[11]["tag"] == "b"           # original columns carried
    assert len(out) == 6                    # every node exactly once


def test_orphans_are_dropped_like_oracle(spark):
    # a child whose parent never appears joins nothing — same as
    # CONNECT BY starting only from the START WITH roots
    rows = [(1, None, "r"), (10, 1, "a"), (99, 42, "orphan")]
    ks = {r["k"] for r in
          connect_by_prior(_df(spark, rows), "k", "parent").collect()}
    assert ks == {1, 10}


def test_cycles_are_unreachable_and_dropped(spark):
    # single-parent cycles have no NULL-parent chain, so they are
    # never reached from the roots — dropped exactly like orphans
    # (Oracle's ORA-01436 needs the general CONNECT BY edge form)
    rows = [(1, 2, "x"), (2, 1, "y"), (0, None, "r")]
    ks = {r["k"] for r in
          connect_by_prior(_df(spark, rows), "k", "parent",
                           max_depth=5).collect()}
    assert ks == {0}


def test_depth_beyond_max_raises(spark):
    chain = [(0, None, "r")] + [(i, i - 1, "c") for i in range(1, 9)]
    with pytest.raises(ValueError, match="max_depth"):
        connect_by_prior(_df(spark, chain), "k", "parent", max_depth=5)
    # and succeeds when the limit admits the depth
    out = connect_by_prior(_df(spark, chain), "k", "parent", max_depth=9)
    assert out.count() == 9
    assert out.filter("k = 8").collect()[0]["lvl"] == 8


def test_no_roots_returns_empty_with_schema(spark):
    rows = [(1, 2, "x"), (2, 3, "y")]
    out = connect_by_prior(_df(spark, rows), "k", "parent", max_depth=3)
    assert out.count() == 0
    assert set(out.columns) == {"k", "parent", "tag", "lvl", "root", "path"}
