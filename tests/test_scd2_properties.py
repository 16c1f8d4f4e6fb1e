"""Property-based SCD2 testing (hypothesis): random batch sequences of
updates/closes against a pure-Python model of the reference procedures
(06_Type2_DimBook.sql / 06_Type2_DimMembers.sql). Invariants checked
after every batch:

- at most one current version per natural key (exactly one unless the
  key was close-only expired);
- validity windows never overlap and never invert
  (expiration >= effective for every expired row);
- history rows are immutable once written;
- the final current values equal the model's last-write state.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.scd2 import (
    OPEN_END, scd2_apply,
)

# Opt-in slow lane (r14): randomized SCD2 invariant sweep.
pytestmark = pytest.mark.slow


KEYS = ["A", "B", "C", "D"]

# one batch: per-key optional action — (new_value | "close")
batch_strategy = st.dictionaries(
    st.sampled_from(KEYS),
    st.one_of(st.integers(min_value=0, max_value=3), st.just("close")),
    min_size=1, max_size=len(KEYS),
)


def _apply_model(model: dict, batch: dict, eff: dt.date) -> None:
    """Reference semantics in plain Python: last-write-wins current
    value per key; close removes the current version."""
    for k, v in batch.items():
        if v == "close":
            model.pop(k, None)
        elif k not in model or model[k][0] != v:
            model[k] = (v, eff)


@pytest.mark.usefixtures("spark")
@given(batches=st.lists(batch_strategy, min_size=1, max_size=4))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scd2_invariants(spark, batches):
    base_date = dt.date(2020, 1, 1)
    dim = spark.createDataFrame(
        [(100_001 + i, k, -1, base_date, OPEN_END, "Y")
         for i, k in enumerate(KEYS)],
        "sk long, nk string, val int, effective_date date, "
        "expiration_date date, curr_ind string")
    model: dict = {k: (-1, base_date) for k in KEYS}

    for i, batch in enumerate(batches):
        eff = base_date + dt.timedelta(days=30 * (i + 1))
        updates = spark.createDataFrame(
            [(k, (0 if v == "close" else v), v == "close")
             for k, v in batch.items()],
            "nk string, val int, _close boolean")
        history_before = dim.filter(F.col("curr_ind") == "N").collect()
        dim = scd2_apply(dim, updates, "nk", tracked=["val"],
                         surrogate_key="sk", effective_date=eff,
                         close_only_flag="_close").cache()
        _apply_model(model, batch, eff)

        rows = dim.collect()
        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r["nk"], []).append(r)
        for k, versions in by_key.items():
            current = [r for r in versions if r["curr_ind"] == "Y"]
            assert len(current) <= 1, f"key {k}: {len(current)} current rows"
            if k in model:
                assert len(current) == 1
                assert current[0]["val"] == model[k][0]
            else:
                assert current == []
            # windows sane and non-overlapping
            spans = sorted((r["effective_date"], r["expiration_date"])
                           for r in versions)
            for (e, x) in spans:
                assert x >= e
            for (_, x1), (e2, _) in zip(spans, spans[1:]):
                assert e2 > x1 or (e2 == x1 == base_date)
        # history immutability
        history_now = {(r["sk"], r["nk"], r["val"], r["effective_date"],
                        r["expiration_date"]) for r in history_before}
        current_hist = {(r["sk"], r["nk"], r["val"], r["effective_date"],
                         r["expiration_date"])
                        for r in rows if r["curr_ind"] == "N"}
        assert history_now <= current_hist
