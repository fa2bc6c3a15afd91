"""Extended operator tests: DISTINCT ON, ARG, PIVOT/UNPIVOT, SPLIT, window
tier, EXPMOVAVG, TYPEINFER — DuckDB or pure-pandas oracles."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal_duck

from sclera_spark.operators import (
    arg_opt,
    distinct_on,
    expmovavg,
    infer_types,
    movavg,
    ordered_window,
    pivot,
    running,
    split_into,
    unpivot,
)


def test_distinct_on_op(tables, duck):
    out = distinct_on(
        tables["orders"],
        on=["o_custkey"],
        order_by=[F.col("o_orderdate").desc(), F.col("o_orderkey").asc()],
    )
    oracle = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey) rn FROM orders) t
    WHERE rn = 1
    """
    assert_df_equal_duck(out, duck, oracle)


def test_arg_op(tables, duck):
    out = arg_opt(tables["orders"], F.col("o_totalprice"), maximize=True, partition_by=["o_orderstatus"])
    oracle = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) rn
          FROM orders) t WHERE rn = 1
    """
    assert_df_equal_duck(out, duck, oracle)


def test_pivot_op(tables, duck):
    out = pivot(
        tables["lineitem"],
        group_by=["l_returnflag"],
        pivot_col="l_linestatus",
        labels=["F", "O"],
        agg=F.sum("l_quantity"),
    )
    oracle = """
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS "F",
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS "O"
    FROM lineitem GROUP BY l_returnflag
    """
    assert_df_equal_duck(out, duck, oracle)


def test_unpivot_op(tables, duck):
    out = unpivot(
        tables["part"],
        ids=["p_partkey"],
        value_cols=["p_size", "p_retailprice"],
        key_col="k",
        value_col="v",
    )
    oracle = """
    SELECT p_partkey, 'p_size' AS k, CAST(p_size AS double) AS v FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS k, p_retailprice AS v FROM part
    """
    assert_df_equal_duck(out, duck, oracle)


def test_split_into_basic(spark):
    rows = [
        (1, 0, 10),
        (1, 5, 15),
        (1, 20, 30),
        (2, 0, 4),
    ]
    df = spark.createDataFrame(rows, "g int, lo int, hi int")
    out = split_into(df, "lo", "hi", "out_lo", "out_hi", partition_by=["g"])
    got = {tuple(r) for r in out.select("g", "out_lo", "out_hi", "lo", "hi").collect()}
    expect = {
        # row (1,0,10) covers atoms (0,5),(5,10); row (1,5,15) covers (5,10),(10,15)
        (1, 0, 5, 0, 10),
        (1, 5, 10, 0, 10),
        (1, 5, 10, 5, 15),
        (1, 10, 15, 5, 15),
        (1, 20, 30, 20, 30),
        (2, 0, 4, 0, 4),
    }
    assert got == expect


def test_split_into_events_oracle(tables, duck):
    # split [value, value+10) intervals per user — compare against a DuckDB
    # formulation of the same semantics (boundary atoms + containment join)
    ev = tables["events"].select("user_id", "event_id", "value").withColumn(
        "lo", F.col("value")
    ).withColumn("hi", F.col("value") + 10)
    out = split_into(ev, "lo", "hi", "s", "e", partition_by=["user_id"]).select(
        "user_id", "event_id", "s", "e"
    )
    oracle = """
    WITH iv AS (SELECT user_id, event_id, value AS lo, value + 10 AS hi FROM events),
    b AS (SELECT DISTINCT user_id, b FROM (
        SELECT user_id, lo AS b FROM iv UNION SELECT user_id, hi FROM iv)),
    atoms AS (SELECT user_id, b AS s, lead(b) OVER (PARTITION BY user_id ORDER BY b) AS e FROM b)
    SELECT iv.user_id, iv.event_id, atoms.s, atoms.e
    FROM iv JOIN atoms ON iv.user_id = atoms.user_id
    WHERE atoms.e IS NOT NULL AND iv.lo <= atoms.s AND atoms.e <= iv.hi
    """
    assert_df_equal_duck(out, duck, oracle)


def test_window_tier(tables, duck):
    w = ordered_window(["user_id"], ["ts", "event_id"])
    ev = tables["events"]
    out = ev.select(
        "user_id",
        "event_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        running(F.sum("value"), w).alias("run_sum"),
        movavg(F.col("value"), 3, w).alias("mov3"),
    )
    oracle = """
    SELECT user_id, event_id,
           lag(value, 1) OVER w AS prev_value,
           row_number() OVER w AS rn,
           rank() OVER w AS rk,
           sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum,
           avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """
    assert_df_equal_duck(out, duck, oracle)


def test_expmovavg(spark):
    pdf = pd.DataFrame(
        {"g": [1, 1, 1, 2, 2], "i": [0, 1, 2, 0, 1], "x": [1.0, 2.0, 3.0, 10.0, 20.0]}
    )
    df = spark.createDataFrame(pdf)
    out = (
        expmovavg(df, "x", decay=0.5, partition_by=["g"], order_by=["i"], out_col="e")
        .orderBy("g", "i")
        .collect()
    )
    exp = pdf.sort_values(["g", "i"]).groupby("g")["x"].transform(
        lambda s: s.ewm(alpha=0.5, adjust=False).mean()
    )
    for row, want in zip(out, exp):
        assert abs(row["e"] - want) < 1e-12


def test_expmovavg_duck_oracle_parity(spark, duck):
    """Mirror the driver's t2 check: the recursive-CTE oracle in
    __spark_entry__.oracle_sql()['expmovavg'] must reproduce the pandas
    ewm(adjust=False) kernel exactly (IEEE add of the two products is
    order-insensitive, so both sides are bitwise-equal float64)."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    sdf = entry.queries()["expmovavg"](spark, SF_DIR)
    assert_df_equal_duck(sdf, duck, entry.oracle_sql()["expmovavg"])


def test_typeinfer(spark):
    df = spark.createDataFrame(
        [("1", "1.5", "2020-01-01", "x"), ("2", "2.5", "2020-02-01", "y")],
        "a string, b string, c string, d string",
    )
    out = infer_types(df)
    types = dict(out.dtypes)
    assert types == {"a": "int", "b": "double", "c": "date", "d": "string"}


# ---------------------------------------------------------------- asof join


def test_asof_join_semantics(spark):
    from sclera_spark.operators import asof_join

    l = spark.createDataFrame(
        [(1, 5, 10), (1, 8, 20), (2, 3, 30), (1, None, 99)], "g int, t int, v int"
    )
    r = spark.createDataFrame(
        [(1, 4, 100), (1, 7, 200), (2, 9, 300), (1, None, 888)],
        "g int, t int, p int",
    )
    back = {(x.g, x.t): x.p for x in asof_join(l, r, on="t", by=["g"]).collect()}
    assert back == {(1, 5): 100, (1, 8): 200, (2, 3): None, (1, None): None}
    fwd = {
        (x.g, x.t): x.p
        for x in asof_join(l, r, on="t", by=["g"], direction="forward").collect()
    }
    assert fwd == {(1, 5): 200, (1, 8): None, (2, 3): 300, (1, None): None}
    tol = {
        (x.g, x.t): x.p
        for x in asof_join(l, r, on="t", by=["g"], tolerance="1").collect()
    }
    assert tol == {(1, 5): 100, (1, 8): 200, (2, 3): None, (1, None): None}
    inner = asof_join(l, r, on="t", by=["g"], how="inner")
    assert inner.count() == 2
    # equal keys match inclusively
    l2 = spark.createDataFrame([(1, 7, 1)], "g int, t int, v int")
    eq = asof_join(l2, r, on="t", by=["g"]).collect()[0]
    assert eq.p == 200


def test_asof_join_matches_pandas_merge_asof(tables):
    import pandas as pd

    from sclera_spark.operators import asof_join

    ev = tables["events"].select("event_id", "user_id", "ts", "event_type", "value")
    left = ev.filter("event_type = 'click'").drop("event_type")
    right = (
        ev.filter("event_type = 'signup'")
        .select("user_id", "ts", "event_id", "value")
        .withColumnRenamed("event_id", "s_id")
        .withColumnRenamed("value", "s_value")
    )
    got = (
        asof_join(left, right, on="ts", by=["user_id"], tolerance="'2' HOUR")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    exp = pd.merge_asof(
        lp, rp, on="ts", by="user_id", tolerance=pd.Timedelta(hours=2)
    ).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(exp)
    for col in ("s_id", "s_value"):
        ge = got[col].fillna(-1).tolist()
        ee = exp[col].fillna(-1).tolist()
        assert ge == ee, f"{col} mismatch"


def test_asof_join_plan_no_nested_loop(tables):
    from sclera_spark.operators import asof_join

    ev = tables["events"].select("event_id", "user_id", "ts", "event_type", "value")
    left = ev.filter("event_type = 'purchase'").drop("event_type")
    right = ev.filter("event_type = 'view'").select(
        "user_id", "ts", tables["events"]["event_id"].alias("v_id")
    )
    df = asof_join(left, right, on="ts", by=["user_id"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the whole point: a window pass, not an inequality join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # no join operator at all — union + window
    assert plan.count("Exchange") <= 2  # union sides + the window shuffle


def test_asof_join_warns_unpartitioned(spark):
    import warnings

    from sclera_spark.operators import asof_join
    from sclera_spark.scale import UnpartitionedFallbackWarning

    l = spark.createDataFrame([(1, 1)], "t int, v int")
    r = spark.createDataFrame([(1, 2)], "t int, p int")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        asof_join(l, r, on="t")
        assert any(issubclass(x.category, UnpartitionedFallbackWarning) for x in w)


# --------------------------------------------------------------- range join


def test_range_join_matches_brute_force(spark):
    """Binned equi-join + canonical-bin emission == brute-force overlap,
    across bin widths smaller / comparable / larger than the intervals."""
    import random

    from sclera_spark.operators import point_in_interval_join, range_join

    rng = random.Random(7)
    L = []
    for i in range(120):
        g, s = rng.randint(0, 3), rng.randint(-50, 100)
        L.append((i, g, s, s + rng.randint(0, 40)))
    R = []
    for i in range(150):
        g, s = rng.randint(0, 3), rng.randint(-50, 100)
        R.append((i, g, s, s + rng.randint(0, 40)))
    l = spark.createDataFrame(L, "lid int, g int, ls long, le long")
    r = spark.createDataFrame(R, "rid int, g int, rs long, re long")
    exp = {
        (a[0], b[0])
        for a in L
        for b in R
        if a[1] == b[1] and a[2] <= b[3] and b[2] <= a[3]
    }
    for w in (7, 64, 1000):
        got = {
            (x.lid, x.rid)
            for x in range_join(
                l, r, ("ls", "le"), ("rs", "re"), by=["g"], bin_width=w
            ).collect()
        }
        assert got == exp, f"bin_width={w}"
    # strict (half-open) overlap drops touching intervals
    strict = {
        (x.lid, x.rid)
        for x in range_join(
            l, r, ("ls", "le"), ("rs", "re"), by=["g"], bin_width=64, closed=False
        ).collect()
    }
    exp_strict = {
        (a[0], b[0])
        for a in L
        for b in R
        if a[1] == b[1] and a[2] < b[3] and b[2] < a[3]
    }
    assert strict == exp_strict and len(strict) < len(exp)
    # point-in-interval degenerate case
    P = [(i, rng.randint(0, 3), rng.randint(-50, 140)) for i in range(100)]
    p = spark.createDataFrame(P, "pid int, g int, pt long")
    got_p = {
        (x.pid, x.rid)
        for x in point_in_interval_join(
            p, r, "pt", ("rs", "re"), by=["g"], bin_width=64
        ).collect()
    }
    exp_p = {
        (a[0], b[0])
        for a in P
        for b in R
        if a[1] == b[1] and b[2] <= a[2] <= b[3]
    }
    assert got_p == exp_p


def test_range_join_plan_is_equi_join(spark):
    from sclera_spark.operators import range_join

    l = spark.range(100).selectExpr("id AS lid", "id % 4 AS g", "id AS ls", "id + 10 AS le")
    r = spark.range(100).selectExpr("id AS rid", "id % 4 AS g", "id AS rs", "id + 10 AS re")
    df = range_join(l, r, ("ls", "le"), ("rs", "re"), by=["g"], bin_width=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# -------------------------------------------------------------- time rollup


def test_time_rollup_cascade_equals_direct(tables):
    """Day buckets re-aggregated from hour buckets == day buckets
    computed directly from raw (exactly for count/min/max)."""
    from pyspark.sql import functions as F

    from sclera_spark.operators import time_rollup

    ev = tables["events"]
    levels = time_rollup(
        ev,
        "ts",
        aggs={"n": ("count", None), "mn": ("min", "value"), "mx": ("max", "value")},
        levels=["1 hour", "1 day"],
        keys=["event_type"],
    )
    got = {
        (r.bucket_start, r.event_type): (r.n, r.mn, r.mx)
        for r in levels["1 day"].collect()
    }
    direct = {
        (r.bucket_start, r.event_type): (r.n, r.mn, r.mx)
        for r in ev.groupBy(
            F.window("ts", "1 day").alias("__w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .select(F.col("__w.start").alias("bucket_start"), "event_type", "n", "mn", "mx")
        .collect()
    }
    assert got == direct and len(got) > 0


def test_time_rollup_validates_nesting_and_kinds(tables):
    import pytest as _pytest

    from sclera_spark.operators import time_rollup

    ev = tables["events"]
    with _pytest.raises(ValueError, match="nest"):
        time_rollup(ev, "ts", {"n": ("count", None)}, ["2 hours", "3 hours"])
    with _pytest.raises(ValueError, match="decomposable"):
        time_rollup(ev, "ts", {"a": ("avg", "value")}, ["1 hour", "1 day"])


def test_asof_hot_group_auto_split(spark):
    """A dominant `by` group must split across >1 range bucket (verdict
    r5 #8): detection finds the hot group with boundaries (=> its window
    runs in multiple tasks), and the two-pass prefix-carry plan returns
    EXACTLY what the single-window plan returns — backward and forward,
    with and without tolerance, on a skewed input where one group holds
    ~95% of rows."""
    from sclera_spark.operators import asof_join
    from sclera_spark.operators.asof import _detect_hot_groups

    n_hot, n_cold = 4000, 100
    left = spark.range(n_hot + n_cold).selectExpr(
        "CASE WHEN id < 4000 THEN 'hot' ELSE concat('g', id % 7) END AS g",
        "CAST(id * 3 % 9973 AS DOUBLE) AS t",
        "id AS lid",
    )
    right = spark.range(2000).selectExpr(
        "CASE WHEN id < 1900 THEN 'hot' ELSE concat('g', id % 7) END AS g",
        "CAST(id * 7 % 9973 AS DOUBLE) AS t",
        "id * 10 AS payload",
    )

    for direction in ("backward", "forward"):
        for tol in (None, "50"):
            base = asof_join(
                left, right, on="t", by=["g"], direction=direction,
                tolerance=tol, hot_group_threshold=None,
            )
            split = asof_join(
                left, right, on="t", by=["g"], direction=direction,
                tolerance=tol, hot_group_threshold=100,
                skew_sample_fraction=1.0, hot_group_buckets=8,
            )
            key = lambda r: (r.g, r.t, r.lid)
            b = sorted(map(tuple, base.collect()))
            s = sorted(map(tuple, split.collect()))
            assert s == b, f"split plan diverged ({direction}, tol={tol})"

    # detection itself: the hot group is found with >=1 boundary, i.e.
    # its window is partitioned into >=2 (group, bucket) tasks
    u = left.selectExpr("g", "t AS __k").unionByName(
        right.selectExpr("g", "t AS __k")
    )
    hot = _detect_hot_groups(u, ["g"], threshold=100, fraction=1.0, buckets=8)
    assert ("hot",) in hot and len(hot[("hot",)]) >= 1
    assert all(k != ("g0",) for k in hot)  # cold groups stay unsplit
