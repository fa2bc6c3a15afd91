"""Automatic co-located JDBC subtree pushdown
(sources/jdbc_pushdown.py; reference exec/Planner.scala:113-212 +
ScleraSqlMapper.scala:117-131 supportedFunctionsOpt gate): a SELECT
whose every table was ADD TABLE'd from one JDBC location runs remotely
as ONE dialect query — one JDBCRelation, no Spark-side join — and
every gate failure falls back to the per-table-scan path with
identical results."""

from __future__ import annotations

import os
import tempfile

import pytest

from sclera_spark.engine import ScleraEngine


@pytest.fixture()
def engine(spark, tables):
    return ScleraEngine(spark)


@pytest.fixture()
def pushdown_env(engine):
    """nation + region in embedded Derby (VARCHAR names, as a real
    RDBMS table would have — Spark's default CLOB mapping cannot
    GROUP BY), registered via ADD LOCATION / ADD TABLE."""
    db = os.path.join(tempfile.mkdtemp(prefix="sclera_derby_pd_"), "db")
    url = f"jdbc:derby:{db};create=true"
    engine.table("nation").write.option(
        "createTableColumnTypes", "n_name VARCHAR(64)"
    ).jdbc(url, "nation_pd", mode="overwrite")
    engine.table("region").write.option(
        "createTableColumnTypes", "r_name VARCHAR(64)"
    ).jdbc(url, "region_pd", mode="overwrite")
    engine.execute(f"ADD LOCATION derpd AS JDBC ('{url}')")
    engine.execute("ADD TABLE derpd.nation_pd")
    engine.execute("ADD TABLE derpd.region_pd")
    yield engine
    engine.execute("REMOVE TABLE nation_pd")
    engine.execute("REMOVE TABLE region_pd")
    engine.execute("REMOVE LOCATION derpd")
    engine.config.pop("jdbc_pushdown", None)


_JOIN_AGG = """
    SELECT r.r_name, count(*) AS n_nations, sum(n.n_nationkey) AS key_sum,
           min(n.n_name) AS first_nation
    FROM nation_pd n JOIN region_pd r ON n.n_regionkey = r.r_regionkey
    WHERE n.n_nationkey >= 1
    GROUP BY r.r_name
"""


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_agg_pushes_as_single_remote_query(pushdown_env):
    eng = pushdown_env
    df = eng.sql(_JOIN_AGG)
    plan = _plan(df)
    assert plan.count("JDBCRelation") == 1  # ONE remote query
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "HashAggregate" not in plan  # aggregation ran remotely too
    eng.config["jdbc_pushdown"] = "off"
    local = eng.sql(_JOIN_AGG)
    assert _plan(local).count("JDBCRelation") == 2
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, local.collect())
    )
    assert df.columns == local.columns


def test_mixed_local_table_falls_back(pushdown_env):
    eng = pushdown_env
    q = """
        SELECT s.s_name, n.n_name
        FROM nation_pd n JOIN supplier s ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey <= 3
    """
    df = eng.sql(q)
    plan = _plan(df)
    assert plan.count("JDBCRelation") == 1  # nation only; supplier local
    assert "Join" in plan
    expected = (
        eng.table("supplier").filter("s_suppkey <= 3").count()
    )
    assert df.count() == expected


def test_unsupported_function_falls_back(pushdown_env):
    eng = pushdown_env
    q = (
        "SELECT concat(n_name, '!') AS x FROM nation_pd "
        "WHERE n_nationkey = 3"
    )
    df = eng.sql(q)
    assert "JDBCRelation" in _plan(df)
    # concat is not in the remote allowlist: executed Spark-side atop a
    # per-table scan, never shipped
    assert df.collect()[0].x.endswith("!")


def test_limit_and_window_fall_back(pushdown_env):
    eng = pushdown_env
    for q, want in (
        ("SELECT n_name FROM nation_pd ORDER BY n_name LIMIT 3", 3),
        (
            "SELECT n_name, row_number() OVER (ORDER BY n_nationkey) "
            "AS rn FROM nation_pd",
            25,
        ),
    ):
        df = eng.sql(q)
        plan = _plan(df)
        # still answered (local path), with Spark operators present
        assert "JDBCRelation" in plan
        assert df.count() == want


def test_remote_truncating_semantics_fall_back(pushdown_env):
    """ANSI AVG(INT) is INT remotely but DOUBLE in Spark — the schema
    reconciliation must refuse the lossy cast and run locally."""
    eng = pushdown_env
    q = (
        "SELECT avg(n_nationkey) AS a FROM nation_pd "
        "WHERE n_nationkey <= 3"
    )
    df = eng.sql(q)
    row = df.collect()[0]
    # keys 0..3: true mean 1.5; a pushed ANSI AVG(INT) would say 1
    assert abs(row.a - 1.5) < 1e-9
    # explicit remote-safe spelling DOES push
    q2 = (
        "SELECT avg(CAST(n_nationkey AS DOUBLE)) AS a FROM nation_pd "
        "WHERE n_nationkey <= 3"
    )
    df2 = eng.sql(q2)
    plan2 = _plan(df2)
    assert plan2.count("JDBCRelation") == 1
    assert "HashAggregate" not in plan2
    assert abs(df2.collect()[0].a - row.a) < 1e-9


def test_alias_registration_maps_remote_name(pushdown_env):
    eng = pushdown_env
    eng.execute("ADD TABLE derpd.nation_pd AS nat_alias")
    try:
        df = eng.sql(
            "SELECT count(*) AS n FROM nat_alias WHERE n_regionkey = 0"
        )
        assert _plan(df).count("JDBCRelation") == 1
        assert "HashAggregate" not in _plan(df)
        assert df.collect()[0].n == 5
    finally:
        eng.execute("REMOVE TABLE nat_alias")


def test_off_switch_disables(pushdown_env):
    eng = pushdown_env
    eng.execute("SET jdbc_pushdown = 'off'")
    df = eng.sql(_JOIN_AGG)
    assert _plan(df).count("JDBCRelation") == 2
    eng.config.pop("jdbc_pushdown", None)


def test_pushdown_parity_fuzz(pushdown_env):
    """Seeded generator queries over the co-located tables: for every
    seed the result with pushdown ON equals the result with pushdown
    OFF (values, column names, order-insensitive), whether the query
    pushed or fell back — and a healthy fraction must actually push
    (the fuzz is not allowed to test only the fallback)."""
    import random

    eng = pushdown_env
    rng = random.Random(8123)

    def gen(seed):
        r = random.Random(seed)
        join = r.random() < 0.6
        frm = (
            "FROM nation_pd n JOIN region_pd r "
            "ON n.n_regionkey = r.r_regionkey"
            if join
            else "FROM nation_pd n"
        )
        preds = []
        if r.random() < 0.7:
            preds.append(f"n.n_nationkey >= {r.randrange(0, 20)}")
        if r.random() < 0.4:
            preds.append(
                f"n.n_regionkey IN ({r.randrange(0,3)}, {r.randrange(2,5)})"
            )
        if r.random() < 0.3:
            preds.append("n.n_name LIKE 'NATION%'")
        where = f" WHERE {' AND '.join(preds)}" if preds else ""
        if r.random() < 0.5:
            # aggregate shape
            key = "r.r_name" if join else "n.n_regionkey"
            aggs = r.sample(
                [
                    "count(*) AS c",
                    "sum(n.n_nationkey) AS s",
                    "min(n.n_name) AS mn",
                    "max(n.n_nationkey) AS mx",
                    "avg(CAST(n.n_nationkey AS DOUBLE)) AS av",
                ],
                r.randint(1, 3),
            )
            having = (
                " HAVING count(*) >= 1" if r.random() < 0.3 else ""
            )
            return (
                f"SELECT {key} AS k, {', '.join(aggs)} {frm}{where} "
                f"GROUP BY {key}{having}"
            )
        cols = r.sample(
            [
                "n.n_nationkey AS a",
                "upper(n.n_name) AS b",
                "n.n_regionkey + 1 AS c",
                "CASE WHEN n.n_regionkey < 2 THEN 'lo' ELSE 'hi' END AS d",
                "coalesce(n.n_name, 'x') AS e",
            ],
            r.randint(1, 3),
        )
        return f"SELECT {', '.join(cols)} {frm}{where}"

    pushed_count = 0
    for seed in range(40):
        sql = gen(9000 + seed)
        eng.config.pop("jdbc_pushdown", None)
        df_on = eng.sql(sql)
        if _plan(df_on).count("JDBCRelation") == 1 and (
            "BroadcastHashJoin" not in _plan(df_on)
        ):
            pushed_count += 1
        rows_on = sorted(map(tuple, df_on.collect()))
        eng.config["jdbc_pushdown"] = "off"
        df_off = eng.sql(sql)
        rows_off = sorted(map(tuple, df_off.collect()))
        assert df_on.columns == df_off.columns, f"seed {seed}: {sql}"
        assert rows_on == rows_off, f"seed {seed}: {sql}"
    eng.config.pop("jdbc_pushdown", None)
    assert pushed_count >= 15, (
        f"only {pushed_count}/40 fuzz queries pushed — the gate is "
        "refusing shapes it should accept"
    )


def test_stale_provenance_cleared_on_remove_and_recreate(pushdown_env):
    """r12 review: REMOVE TABLE (or CREATE TABLE AS over the name) must
    clear location provenance — a stale entry would route queries on
    the NEW local table to the old remote database silently."""
    from pyspark.sql import functions as F

    eng = pushdown_env
    eng.execute("ADD TABLE derpd.nation_pd AS ghost_t")
    eng.execute("REMOVE TABLE ghost_t")
    assert "ghost_t" not in eng.table_locations
    # re-register the name as a LOCAL table with different content
    eng.add_table(
        "ghost_t",
        eng.table("nation").filter(F.col("n_nationkey") < 3),
    )
    try:
        df = eng.sql("SELECT count(*) AS n FROM ghost_t")
        assert "JDBCRelation" not in _plan(df)
        assert df.collect()[0].n == 3  # the LOCAL rows, not remote 25
    finally:
        eng.execute("REMOVE TABLE ghost_t")
    # CREATE TABLE AS over a location-backed name clears it too
    eng.execute("ADD TABLE derpd.nation_pd AS ghost_u")
    eng.execute("CREATE TABLE ghost_u AS SELECT 1 AS n_nationkey")
    try:
        df = eng.sql("SELECT count(*) AS n FROM ghost_u")
        assert "JDBCRelation" not in _plan(df)
        assert df.collect()[0].n == 1
    finally:
        eng.execute("DROP TABLE ghost_u")
    assert "ghost_u" not in getattr(eng, "table_locations", {})


def test_other_location_table_blocks_pushdown(pushdown_env):
    """A query mentioning a table of a DIFFERENT JDBC location (even in
    a position the ref-scanner misses, like a comma-join) must never
    ship to the chosen location."""
    import tempfile

    eng = pushdown_env
    db2 = os.path.join(tempfile.mkdtemp(prefix="sclera_derby_pd2_"), "db")
    url2 = f"jdbc:derby:{db2};create=true"
    eng.table("region").write.option(
        "createTableColumnTypes", "r_name VARCHAR(64)"
    ).jdbc(url2, "region_other", mode="overwrite")
    eng.execute(f"ADD LOCATION derpd2 AS JDBC ('{url2}')")
    eng.execute("ADD TABLE derpd2.region_other")
    try:
        q = (
            "SELECT count(*) AS n FROM nation_pd, region_other "
            "WHERE nation_pd.n_regionkey = region_other.r_regionkey"
        )
        df = eng.sql(q)
        # two separate scans (one per location), joined in Spark
        assert _plan(df).count("JDBCRelation") == 2
        assert df.collect()[0].n == 25
    finally:
        eng.execute("REMOVE TABLE region_other")
        eng.execute("REMOVE LOCATION derpd2")


def test_order_by_falls_back(pushdown_env):
    """Remote NULL ordering differs from Spark's ASC NULLS FIRST, so a
    bare ORDER BY runs locally (observable output order parity)."""
    eng = pushdown_env
    df = eng.sql("SELECT n_name FROM nation_pd ORDER BY n_name")
    plan = _plan(df)
    assert "Sort" in plan  # Spark-side sort, not remote
    assert df.count() == 25
