"""Perf-regression gate mechanism (bench.py check_budgets): a per-query
min past 2x its frozen anchor must be flagged; the gate only applies at
the calibrated (sf0.1, unreplicated) point so scaled stress runs don't
false-positive."""

from __future__ import annotations

import bench


def test_every_headline_query_has_a_budget():
    # bench_names in main() mirrors this list — a new headline query must
    # get a budget or it ships ungated
    for name in bench.BUDGETS:
        assert bench.BUDGETS[name] > 0


def test_regression_is_flagged():
    good = {n: b * 0.5 for n, b in bench.BUDGETS.items()}
    assert bench.check_budgets(good, 0.1, 1) == []
    bad = dict(good, split_intervals=bench.BUDGETS["split_intervals"] * 3)
    v = bench.check_budgets(bad, 0.1, 1)
    assert [x["query"] for x in v] == ["split_intervals"]
    assert v[0]["budget"] == bench.BUDGETS["split_intervals"]


def test_gate_only_at_calibrated_point():
    bad = {n: b * 10 for n, b in bench.BUDGETS.items()}
    assert bench.check_budgets(bad, 0.01, 1) == []  # wrong SF
    assert bench.check_budgets(bad, 0.1, 10) == []  # replicated stress run
    assert len(bench.check_budgets(bad, 0.1, 1)) == len(bench.BUDGETS)
