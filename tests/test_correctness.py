"""Differential tests: every registry query must match DuckDB exactly
(the driver's gate, run locally). As of round 2 the whole registry is
oracle-backed — the sketch/ANN families are gated through derived
ground truths (see plans/llm_ops.py) — so there is no rows-only tier
left to weaken the check."""

from __future__ import annotations

import pytest

from library_data_warehouse_and_business_analytics_system_spark.plans import QUERIES

from .helpers import assert_frames_match

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


def test_every_query_is_oracle_backed():
    assert [n for n, s in QUERIES.items() if s.oracle is None] == []


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)
