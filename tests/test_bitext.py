"""Margin-based bitext mining (operators/bitext.py): numpy
differential on the full pipeline, the hubness property the margin
criterion exists for, and the ANN ``pairs=`` override path."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from library_data_warehouse_and_business_analytics_system_spark.operators.bitext import (
    _prep,
    margin_mine,
)

SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def _mk(spark, vecs: np.ndarray, ids=None):
    ids = ids if ids is not None else range(len(vecs))
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    return spark.createDataFrame(rows, SCHEMA)


def _numpy_margin(a: np.ndarray, b: np.ndarray, k: int):
    """Reference margins: cos / mean of both endpoints' top-k. Inputs
    pass through float32 first — the operator reads array<float>
    columns, so its doubles start from the float32-rounded values."""
    a = a.astype(np.float32).astype(np.float64)
    b = b.astype(np.float32).astype(np.float64)
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    cos = an @ bn.T  # |A| x |B|
    top_a = np.sort(cos, axis=1)[:, ::-1][:, :k].mean(axis=1)
    top_b = np.sort(cos, axis=0)[::-1][:k, :].mean(axis=0)
    return cos / ((top_a[:, None] + top_b[None, :]) / 2.0)


def test_margin_matches_numpy(spark):
    rng = np.random.default_rng(7)
    a, b = rng.normal(size=(20, 8)), rng.normal(size=(30, 8))
    got = {
        r["src_id"]: (r["tgt_id"], r["margin"])
        for r in margin_mine(_mk(spark, a), _mk(spark, b, ids=range(100, 130)),
                             k=4, threshold=0.0).collect()
    }
    ref = _numpy_margin(a, b, k=4)
    assert len(got) == 20  # threshold 0 keeps every src's best pair
    for i in range(20):
        j = int(np.argmax(ref[i]))
        tgt, m = got[i]
        assert tgt == 100 + j
        assert math.isclose(m, ref[i, j], rel_tol=1e-9), (i, m, ref[i, j])


def test_threshold_filters_and_sorting_is_deterministic(spark):
    rng = np.random.default_rng(11)
    a, b = rng.normal(size=(16, 8)), rng.normal(size=(16, 8))
    full = margin_mine(_mk(spark, a), _mk(spark, b), k=3,
                       threshold=0.0).collect()
    cut = sorted(r["margin"] for r in full)[len(full) // 2]
    kept = margin_mine(_mk(spark, a), _mk(spark, b), k=3,
                       threshold=cut).collect()
    assert {r["src_id"] for r in kept} == {
        r["src_id"] for r in full if r["margin"] >= cut}
    # bit-stable under re-evaluation (shuffled partitioning)
    again = margin_mine(_mk(spark, a), _mk(spark, b), k=3,
                        threshold=cut).collect()
    assert sorted(map(tuple, kept)) == sorted(map(tuple, again))


def test_hub_vector_loses_to_mutual_pair(spark):
    """The property plain cosine top-1 lacks: a hub close to
    everything has a high neighborhood average, so its margin to any
    one target is low, while an isolated mutual pair keeps margin >>
    1 even at a LOWER raw cosine."""
    dim = 8
    base = np.zeros((1, dim)); base[0, 0] = 1.0
    # hub: b-targets all near e0 -> the a-side hub's top-k avg ~ its cos
    hub_a = base.copy()
    b_near = np.tile(base, (6, 1)) + 0.05 * np.random.default_rng(3).normal(
        size=(6, dim))
    # mutual pair on an axis nobody else uses
    pair_a = np.zeros((1, dim)); pair_a[0, 3] = 1.0
    pair_b = np.zeros((1, dim)); pair_b[0, 3] = 0.8; pair_b[0, 4] = 0.6
    a = np.vstack([hub_a, pair_a])
    b = np.vstack([b_near, pair_b])
    out = {r["src_id"]: r for r in margin_mine(
        _mk(spark, a), _mk(spark, b, ids=range(100, 107)),
        k=3, threshold=0.0).collect()}
    hub, pair = out[0], out[1]
    assert pair["cos"] < max(
        r["cos"] for r in [hub])  # the hub's raw cosine is higher...
    assert pair["margin"] > hub["margin"]  # ...but the margin flips


def test_pairs_override_matches_brute_when_candidates_cover_topk(spark):
    """The ANN-candidate path: restricting pairs to each src's true
    top-8 cosine candidates (a superset of k=3 neighborhoods on the
    src side plus the winning pair) must reproduce the brute winners
    for every src whose backward neighborhood is also covered. We
    check the degenerate-complete case: candidates = all pairs,
    passed through the pairs= interface."""
    rng = np.random.default_rng(23)
    a, b = rng.normal(size=(10, 8)), rng.normal(size=(12, 8))
    da, db = _mk(spark, a), _mk(spark, b, ids=range(50, 62))
    brute = margin_mine(da, db, k=3, threshold=0.0).collect()
    pairs = (_prep(da, "vec_id", "embedding", "src")
             .crossJoin(F.broadcast(_prep(db, "vec_id", "embedding", "tgt"))))
    via_pairs = margin_mine(da, db, k=3, threshold=0.0,
                            pairs=pairs).collect()
    assert sorted(map(tuple, brute)) == sorted(map(tuple, via_pairs))


def test_snap_decimals_quantizes_margin(spark):
    """Snapped margins must equal round-half-up(unsnapped, 6) — the
    cross-engine grid contract. Comparing against the UNSNAPPED run on
    the same data (ADVICE r10) pins the rounding DIRECTION: idempotence
    alone would also pass for truncation or round-half-down."""
    rng = np.random.default_rng(5)
    a, b = rng.normal(size=(8, 8)), rng.normal(size=(8, 8))
    raw = {(r["src_id"], r["tgt_id"]): r["margin"]
           for r in margin_mine(_mk(spark, a), _mk(spark, b), k=2,
                                threshold=0.0).collect()}
    out = margin_mine(_mk(spark, a), _mk(spark, b), k=2, threshold=0.0,
                      snap_decimals=6).collect()
    assert out
    rounded_up = 0
    for r in out:
        m_raw = raw[(r["src_id"], r["tgt_id"])]
        # the exact half-up quantizer, evaluated in Python on the
        # unsnapped value
        assert r["margin"] == math.floor(m_raw * 1e6 + 0.5) / 1e6
        # and it is a fixed point of itself (grid membership)
        assert r["margin"] == math.floor(r["margin"] * 1e6 + 0.5) / 1e6
        if (m_raw * 1e6) % 1.0 >= 0.5:
            rounded_up += 1
            # truncation would have produced the grid point BELOW
            assert r["margin"] > math.floor(m_raw * 1e6) / 1e6
    # the rounding direction was actually exercised (some fractional
    # part >= .5 existed in the sample)
    assert rounded_up > 0


def test_half_boundary_rounds_up(spark):
    """An exact .5-boundary margin must round UP (half-up, the floor
    (x*s+0.5)/s idiom), not to-even or down. Construct it: identical
    unit vectors everywhere make every cosine 1.0, every neighborhood
    average 1.0, margin exactly 1.0 — then snap at d=6 must return
    1.0 exactly, and the same idiom applied to the adjacent
    half-boundary values agrees with Python's half-up."""
    dim = 4
    v = np.zeros((3, dim)); v[:, 0] = 1.0
    out = margin_mine(_mk(spark, v), _mk(spark, v, ids=range(10, 13)),
                      k=2, threshold=0.0, snap_decimals=6).collect()
    assert out and all(r["margin"] == 1.0 for r in out)
    # the quantizer idiom itself, at true .5 boundaries
    for x, want in [(1.0000005, 1.000001), (0.9999995, 1.0)]:
        assert math.floor(x * 1e6 + 0.5) / 1e6 == want


@pytest.mark.slow  # opt-in lane (r14): endurance/equivalence run
def test_bucket_cap_bounds_degenerate_corpus(spark):
    """A planted degenerate corpus — 60 IDENTICAL vectors per side —
    lands every copy in one shared bucket per table; uncapped that is
    a 3.6k-pair bucket (O(n²) in the cluster size, the r10 verdict's
    scale-killer). With bucket_cap the candidate set is bounded by
    n_tables x cap² plus the background, deterministic across runs,
    and distinct planted pairs are still mined."""
    from library_data_warehouse_and_business_analytics_system_spark.operators.bitext import (
        srp_candidate_ids,
        srp_candidate_pairs,
    )

    rng = np.random.default_rng(41)
    n_dup, n_bg, dim = 60, 40, 16
    dup = np.zeros((1, dim)); dup[0, 2] = 1.0
    a_bg = rng.normal(size=(n_bg, dim))
    b_bg = rng.normal(size=(n_bg, dim))
    # a distinct planted pair away from the duplicate cluster
    a_bg[0] = 0.0; a_bg[0, 7] = 1.0
    b_bg[0] = a_bg[0] + 1e-3 * rng.normal(size=dim)
    a = np.vstack([np.tile(dup, (n_dup, 1)), a_bg])
    b = np.vstack([np.tile(dup, (n_dup, 1)), b_bg])
    da = _mk(spark, a)
    db = _mk(spark, b, ids=range(1000, 1000 + len(b)))

    n_tables, cap = 4, 8
    uncapped = srp_candidate_ids(da, db, dim=dim, n_planes=6,
                                 n_tables=n_tables, seed=13).count()
    assert uncapped >= n_dup * n_dup  # the degenerate blow-up is real

    capped_ids = srp_candidate_ids(da, db, dim=dim, n_planes=6,
                                   n_tables=n_tables, seed=13,
                                   bucket_cap=cap)
    n_capped = capped_ids.count()
    # cluster contribution bounded by n_tables x cap² (dedup can only
    # shrink it); background pairs are sparse
    assert n_capped < n_tables * cap * cap + 200
    assert n_capped < uncapped
    # deterministic survivor sample: bit-stable across re-evaluation
    s1 = sorted(map(tuple, capped_ids.collect()))
    s2 = sorted(map(tuple, srp_candidate_ids(
        da, db, dim=dim, n_planes=6, n_tables=n_tables, seed=13,
        bucket_cap=cap).collect()))
    assert s1 == s2
    # mining still recovers the distinct planted pair (its bucket is
    # not the over-cap one), and the capped cluster still yields
    # identical-vector pairs (cos == 1) for surviving members
    pairs = srp_candidate_pairs(da, db, dim=dim, n_planes=6,
                                n_tables=n_tables, seed=13,
                                bucket_cap=cap)
    out = {r["src_id"]: r for r in margin_mine(
        da, db, k=4, threshold=0.0, pairs=pairs).collect()}
    planted_src = n_dup  # a_bg[0]'s id
    assert out[planted_src]["tgt_id"] == 1000 + n_dup
    assert any(r["cos"] > 0.999999 for i, r in out.items()
               if i < n_dup)


def test_srp_candidates_mine_planted_pairs(spark):
    """The 100 TB posture: SRP-bucketed candidates feed margin_mine.
    Planted near-identical cross-side pairs share every bucket (equal
    vectors hash identically in all tables), so the bucketed mine must
    recover each planted src's true partner with a margin above the
    random background, while the candidate set stays far below |A|x|B|."""
    from library_data_warehouse_and_business_analytics_system_spark.operators.bitext import (
        srp_candidate_pairs,
    )

    rng = np.random.default_rng(31)
    na = nb = 120
    a = rng.normal(size=(na, 16))
    b = rng.normal(size=(nb, 16))
    planted = list(range(0, 20, 2))  # a[i] ~ b[i] for even i < 20
    for i in planted:
        b[i] = a[i] + 1e-3 * rng.normal(size=16)
    da = _mk(spark, a)
    db = _mk(spark, b, ids=range(1000, 1000 + nb))
    pairs = srp_candidate_pairs(da, db, dim=16, n_planes=6, n_tables=6,
                                seed=9)
    n_cand = pairs.count()
    assert 0 < n_cand < na * nb * 0.6  # bucketing really prunes
    out = {r["src_id"]: r for r in margin_mine(
        da, db, k=4, threshold=0.0, pairs=pairs).collect()}
    for i in planted:
        assert out[i]["tgt_id"] == 1000 + i, (i, out.get(i))
        assert out[i]["margin"] > 1.1
