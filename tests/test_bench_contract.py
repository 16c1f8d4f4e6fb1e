"""Bench-harness contract: the driver tail-captures stdout with a
bounded buffer (~2000 chars — round 2's full 61-entry JSON line got
clipped and recorded `parsed: null`), so the slim line bench.py prints
must stay safely under that. Guard it statically: the line size is
driven by the headline set, which must stay small and stable."""

from __future__ import annotations

import json

from library_data_warehouse_and_business_analytics_system_spark.plans import QUERIES

#: library-section keys bench.py appends to the slim stdout line
_EXTRA_KEYS = ("library_generate", "library_etl", "library_initial_load",
               "lqy_query1", "lqy_query2", "lqy_query3")


def test_slim_stdout_line_fits_capture_window():
    headline = [n for n, s in QUERIES.items() if s.bench]
    # never grow the headline set silently — it is the cross-round
    # comparable AND the stdout-size budget
    assert len(headline) <= 16, headline
    fake = {
        "metric": "headline_queries_total", "value": 9999.9999,
        "unit": "sec",
        "queries": {n: 9999.9999 for n in headline + list(_EXTRA_KEYS)},
        "all_queries_total": 9999.9999, "n_queries": len(QUERIES),
        "n_skipped": 0, "n_errors": 0, "sf": 0.1,
    }
    line = json.dumps(fake)
    assert len(line) < 1600, (
        f"slim bench line would be {len(line)} chars — risks the "
        "driver's tail-capture clipping it (round-2 failure mode)")


def test_headline_queries_still_registered():
    """Every bench=True name must resolve — a renamed query would
    silently drop out of the headline total."""
    for n, s in QUERIES.items():
        if s.bench:
            assert callable(s.fn), n
