"""Triangle-counting semantics (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.graph import (
    triangle_counts,
)


def _counts(spark, edges):
    df = spark.createDataFrame(edges, ["a", "b"])
    return {r["node"]: r["n_triangles"]
            for r in triangle_counts(df).collect()}


def test_single_triangle(spark):
    c = _counts(spark, [(1, 2), (2, 3), (1, 3)])
    assert c == {1: 1, 2: 1, 3: 1}


def test_k4_every_node_in_three_triangles(spark):
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    c = _counts(spark, edges)
    assert c == {1: 3, 2: 3, 3: 3, 4: 3}


def test_path_has_no_triangles_but_all_nodes_reported(spark):
    c = _counts(spark, [(1, 2), (2, 3), (3, 4)])
    assert c == {1: 0, 2: 0, 3: 0, 4: 0}


def test_star_hub_has_no_triangles(spark):
    """Celebrity node: a hub with many leaves — orientation points
    every edge AWAY from the leaves (degree 1) INTO the hub, so the
    hub generates zero wedges despite its degree."""
    c = _counts(spark, [(100, i) for i in range(20)])
    assert all(v == 0 for v in c.values())


def test_edge_order_and_direction_invariance(spark):
    base = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]
    flipped = [(b, a) for a, b in reversed(base)]
    assert _counts(spark, base) == _counts(spark, flipped)
