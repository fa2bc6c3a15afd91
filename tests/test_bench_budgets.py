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


def test_gate_only_at_calibrated_points():
    bad = {n: b * 10 for n, b in bench.BUDGETS.items()}
    assert bench.check_budgets(bad, 0.01, 1) == []  # wrong SF
    assert bench.check_budgets(bad, 0.1, 3) == []  # uncalibrated scale
    assert len(bench.check_budgets(bad, 0.1, 1)) == len(bench.BUDGETS)
    # r12: scale=10 (~sf1) is a second calibrated point with its own
    # budget table for the storage/LLM tiers
    bad10 = {n: b * 10 for n, b in bench.BUDGETS_SCALE10.items()}
    assert bench.check_budgets(bad10, 0.01, 10) == []
    assert len(bench.check_budgets(bad10, 0.1, 10)) == len(
        bench.BUDGETS_SCALE10
    )
    good10 = {n: b * 0.5 for n, b in bench.BUDGETS_SCALE10.items()}
    assert bench.check_budgets(good10, 0.1, 10) == []


def test_engine_sql_fixed_cost_floor(spark, tables):
    """The per-statement driver overhead of engine.sql — the gate
    regexes, TABLE_CHANGES rewrite probe, plot-clause split and the
    manifest-pruning hook's early-outs — must stay bounded for a plain
    non-manifest query. This is the serving path's latency floor: a
    driver-side regression here taxes EVERY query, so it is pinned
    like the bench budgets. We measure LOWERING only (no .collect()):
    the Spark job itself is not under test."""
    import time

    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    for name, df in tables.items():
        engine.add_table(name, df)
    q = (
        "SELECT r_name, count(*) AS n FROM region "
        "GROUP BY r_name ORDER BY r_name"
    )
    engine.sql(q)  # warm: regex compiles, first-plan caches
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        engine.sql(q)
    per_stmt = (time.perf_counter() - t0) / reps
    # generous 150 ms bound: actual is ~5-30 ms (analysis dominates);
    # a gate-regex or plan-walk regression shows up as 2-10x
    assert per_stmt < 0.15, f"engine.sql overhead {per_stmt * 1000:.1f} ms"
